"""Acceptance config 4 preset (BASELINE.json configs[3]); canonical
definition lives in mcax.config.CONFIG4 — this module is the file-per-config
entry point (SURVEY.md §5 config system)."""
from mcax.config import CONFIG4 as CONFIG  # noqa: F401
