"""Small shared helpers."""

from __future__ import annotations


def default_blocks(factor: int = 2, floor: int = 8) -> int:
    """A sensible Dataset block count for this cluster: ~factor blocks
    per CPU.  Ray's default (200) drowns small/medium inputs in task
    overhead; explicit block counts keep shuffles proportional."""
    try:
        import ray

        return max(floor, int(ray.cluster_resources().get("CPU", 16)) * factor)
    except Exception:
        return 32
