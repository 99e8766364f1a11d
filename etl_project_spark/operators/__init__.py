"""First-class operators beyond the relational core.

Everything here is built from pure column expressions or Arrow-batched
Pandas UDFs — no driver-side collects, no row-at-a-time Python in hot
paths — so each operator scales with partitions on a real cluster.
"""
