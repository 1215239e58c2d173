"""Design-problem model families (the reference's ``problems/`` layer)."""

from difflexmm_tpu.models import quads_focusing  # noqa: F401
