"""Unit tests for snapshot diff + table checksum (operators/diff.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from postgresql_transfool_placeholder import noop  # noqa: F401
