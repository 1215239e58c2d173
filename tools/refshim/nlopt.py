"""Import stub for nlopt so reference problem modules import without the
C library installed. Only the timing harness imports those modules; it never
calls into nlopt (it times jit(value_and_grad(objective)) directly, which is
the per-iteration hot path — reference problems/quads_focusing.py:565)."""


LD_MMA = object()


class opt:  # pragma: no cover - never constructed by the harness
    def __init__(self, *args, **kwargs):
        raise RuntimeError("nlopt stub: the real nlopt is not installed")
