"""Scalar / aggregate function helpers shared by the operator library."""

from .exact import dsum, davg, dec  # noqa: F401
