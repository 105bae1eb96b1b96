"""Pure vectorized numpy kernels — no Ray imports here.

Every function in this subpackage operates on numpy arrays (or scalars) and is
unit-tested against the reference's golden values before being used inside
``map_batches`` / ``map_groups`` stages.
"""
