"""Thin re-export: synthetic system builders live in maniac_tpu.systems."""

from maniac_tpu.systems import *  # noqa: F401,F403
from maniac_tpu.systems import (_random_rotation, _write_data, _write_deck,
                                _write_inc)  # noqa: F401
