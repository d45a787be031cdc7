"""Acceptance config 5 preset (BASELINE.json configs[4]); canonical
definition lives in mcax.config.CONFIG5 — this module is the file-per-config
entry point (SURVEY.md §5 config system)."""
from mcax.config import CONFIG5 as CONFIG  # noqa: F401
