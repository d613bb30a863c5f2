"""Scalar/column-level function library (all JVM-side built-ins unless noted)."""
