"""Acceptance config 2 preset (BASELINE.json configs[1]); canonical
definition lives in mcax.config.CONFIG2 — this module is the file-per-config
entry point (SURVEY.md §5 config system)."""
from mcax.config import CONFIG2 as CONFIG  # noqa: F401
