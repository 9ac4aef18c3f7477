"""Compute kernels: geometry, clustering, stereo matching, flow warping."""


def resolve_auto_backend(backend: str) -> str:
    """Single-sourced 'auto' policy for every Pallas/XLA kernel dispatch:
    the Pallas kernel on accelerators, the XLA oracle form on CPU. Call
    sites may further restrict (e.g. SGM's shape constraint)."""
    if backend != "auto":
        return backend
    import jax

    return "pallas" if jax.default_backend() != "cpu" else "xla"
