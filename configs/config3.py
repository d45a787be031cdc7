"""Acceptance config 3 preset (BASELINE.json configs[2]); canonical
definition lives in mcax.config.CONFIG3 — this module is the file-per-config
entry point (SURVEY.md §5 config system)."""
from mcax.config import CONFIG3 as CONFIG  # noqa: F401
