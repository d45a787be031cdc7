"""Acceptance config 1 preset (BASELINE.json configs[0]); canonical
definition lives in mcax.config.CONFIG1 — this module is the file-per-config
entry point (SURVEY.md §5 config system)."""
from mcax.config import CONFIG1 as CONFIG  # noqa: F401
