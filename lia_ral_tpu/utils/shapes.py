"""Shared shape-bucketing policy for compile-once dispatch.

Every ragged axis that reaches a jitted kernel is padded to one of a
small set of static shapes: frame axes to multiples of FRAME_BUCKET,
batch/client axes to powers of two.  Keeping the policy in one place
stops the bucket shapes of different tools drifting apart (they share
the persistent XLA compile cache, so agreement = cache hits)."""

from __future__ import annotations

FRAME_BUCKET = 1024


def next_pow2(n: int) -> int:
    """Smallest power of two ≥ n (1 for n ≤ 1)."""
    return 1 << max(n - 1, 0).bit_length()


def bucket_len(n: int, bucket: int = FRAME_BUCKET) -> int:
    """Smallest multiple of ``bucket`` ≥ max(n, 1)."""
    return -(-max(n, 1) // bucket) * bucket
