"""Shared stage helpers."""

from __future__ import annotations


def resolve_ref(ref):
    """Unwrap a broadcast ``ray.ObjectRef`` (``ray.put`` small-side
    pattern); pass plain objects through (tests, local kernels)."""
    try:
        import ray

        if isinstance(ref, ray.ObjectRef):
            return ray.get(ref)
    except ImportError:
        pass
    return ref
