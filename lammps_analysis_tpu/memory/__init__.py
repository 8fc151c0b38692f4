"""Static batch planning (memory budget -> slab/tile plans)."""
from .planner import BatchPlan, BatchPlanner  # noqa: F401
