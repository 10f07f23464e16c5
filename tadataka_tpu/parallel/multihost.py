"""Multi-host scaffolding: distributed initialization + host-aware meshes.

BASELINE.md's north star asks for >80% BA scaling efficiency at 2+
hosts.  The single-controller code in this package (sharded_semi_dense,
distributed_ba) is written against an abstract ``Mesh`` and works
unchanged over a multi-host device set — what a multi-host launch
additionally needs is (1) runtime initialization on every process and
(2) a mesh whose axis layout keeps the heavy collectives on ICI instead
of DCN.  This module provides both; it degenerates gracefully to the
single-process case, which is what CI can exercise (multi-host hardware
is not available on this rig — the launcher is validated by its
single-process path plus the virtual-device mesh tests).

Collective-placement rule encoded here: the landmark axis of the
distributed BA psum and the pixel-column axis of the sharded sweep both
reduce per-iteration megabyte-scale blocks — they go on the FAST
(intra-slice ICI) mesh dimension; anything sharded across hosts rides
DCN and should only move bulk data that amortizes (frame batches).
"""

import os

import numpy as np
import jax


def initialize_distributed(coordinator_address=None, num_processes=None,
                           process_id=None):
    """Initialize the JAX distributed runtime for a multi-host launch.

    Arguments default from the standard env vars
    (JAX_COORDINATOR_ADDRESS, JAX_NUM_PROCESSES, JAX_PROCESS_ID) and the
    call is a NO-OP for single-process runs (num_processes in (None, 1))
    so the same entry point works everywhere.

    Returns (process_id, num_processes).
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if num_processes is None:
        num_processes = int(os.environ.get("JAX_NUM_PROCESSES", "1"))
    if process_id is None:
        process_id = int(os.environ.get("JAX_PROCESS_ID", "0"))

    if num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id)
    return process_id, num_processes


def make_host_mesh(intra_axis="shard", inter_axis="host"):
    """Build a 2-D (host, intra-host) mesh over ALL devices.

    The fast ``intra_axis`` spans each host's local devices (ICI) — put
    the per-iteration collectives there: the landmark-marginalized
    camera-system psum of distributed_ba and the regularization halo of
    the sharded sweep.  The slow ``inter_axis`` spans hosts (DCN) — use
    it for frame/sequence parallelism where transfers amortize over a
    whole pipeline step.

    Single-host processes get a (1, n_local) mesh, so code written
    against this layout runs unchanged in CI.

    Devices are grouped EXPLICITLY by ``process_index`` (ADVICE r4: a
    bare reshape assumes jax.devices() orders contiguously by process,
    which device-id ordering does not guarantee on all topologies — a
    straddled row would put the per-iteration collectives on DCN).
    """
    devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    n_local = jax.local_device_count()
    devices = np.asarray(devs).reshape(-1, n_local)
    for row in devices:
        assert len({d.process_index for d in row}) == 1, (
            "uneven devices per process")
    return jax.sharding.Mesh(devices, (inter_axis, intra_axis))


def local_slice(mesh, global_array_len, inter_axis="host"):
    """(start, length) of this host's block of an inter-host-sharded
    leading axis (e.g. which frames of a sequence this host ingests).

    The remainder of a non-divisible length goes one-each to the first
    hosts (ADVICE r4: the floor division silently dropped the last
    ``len % n_hosts`` items)."""
    n_hosts = mesh.shape[inter_axis]
    idx = jax.process_index()
    per, rem = divmod(global_array_len, n_hosts)
    start = idx * per + min(idx, rem)
    return start, per + (1 if idx < rem else 0)
