"""Sources & sinks (SURVEY.md §2.2, §3 EP2)."""

from .fixtures import load_fixture, register_fixture_views
from .datagen import datagen_stream, QUICKSTARTS

__all__ = [
    "load_fixture",
    "register_fixture_views",
    "datagen_stream",
    "QUICKSTARTS",
]
