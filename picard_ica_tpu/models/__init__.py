"""Model/algorithm implementations: core Picard loop, FastICA, JADE."""

from . import core, fastica, jade

__all__ = ["core", "fastica", "jade"]
