"""Device-free layout constants shared by the control plane (scheduler) and
the batch assembler.  Kept jax-free so the scheduler layer never imports a
device framework (same layering as the reference, scheduler.py:30-34)."""

PREFILL_TILE = 128  # rows per prefill query tile (one sequence per tile)


def bucket(n: int, minimum: int = 8) -> int:
    """Next power-of-two bucket >= n (bounded below for tiling sanity)."""
    b = minimum
    while b < n:
        b *= 2
    return b


def round_up(n: int, m: int) -> int:
    return (n + m - 1) // m * m
