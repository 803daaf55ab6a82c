"""Relational analytics queries demonstrating engine generality
(TPC-H-style shapes adapted to the driver's star schema)."""
