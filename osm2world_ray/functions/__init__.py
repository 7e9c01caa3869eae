"""Scalar value-normalization functions (ValueParseUtil analogues)."""
