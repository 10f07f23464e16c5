"""Exceptions raised by host-side orchestration.

Parity surface: /root/reference/tadataka/exceptions.py.  Device code never
raises — it flags; these exceptions belong to the host keyframe logic.
"""

import sys


class BaseException(Exception):
    def __init__(self, message):
        super().__init__(message)
        self.message = message


class NotEnoughInliersException(BaseException):
    pass


class InvalidDepthException(BaseException):
    pass


def print_error(message):
    print(message, file=sys.stderr)
