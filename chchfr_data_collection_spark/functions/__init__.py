"""Scalar/column function library — native Catalyst expressions first."""
