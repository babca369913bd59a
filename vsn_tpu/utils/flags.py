"""Shared parsing for the VSN_* kernel A/B gate environment variables.

Every measured-default gate (VSN_PALLAS_RELAYOUT, VSN_PALLAS_GLUE,
VSN_STEM_IM2COL, VSN_UNFOLD_STEM, VSN_DW_SHIFT, ...) accepts the same
value grammar so A/B scripts can flip any of them uniformly.
"""

from __future__ import annotations

import os
from typing import Optional

_FALSY = ("", "0", "false", "off", "no")


def env_flag(name: str) -> Optional[bool]:
    """Tri-state gate parse: None when unset (caller applies its measured
    default); '', '0', 'false', 'off', 'no' (any case) -> False; anything
    else -> True. Never raises on non-numeric values."""
    env = os.environ.get(name)
    if env is None:
        return None
    return env.strip().lower() not in _FALSY
