"""Project layer."""
from .project import Project  # noqa: F401
