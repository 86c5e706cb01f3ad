"""Script-directory source + suffix pairing (S6/J5).

The reference reads ``.hql``/``.sql`` files under convention directories
``nw_<table>/`` and ``sf_dw_<table>/`` and pairs a Hive script with its
Snowflake counterpart by the shared name suffix
(``tools/discrepancy_suggester_tool.py:37-82``).
"""

from __future__ import annotations

import os
import re


def read_script_dir(directory: str, exts: tuple[str, ...] = (".sql", ".hql")) -> dict[str, str]:
    """filename → content for every script under ``directory``."""
    out: dict[str, str] = {}
    for name in sorted(os.listdir(directory)):
        if name.endswith(exts):
            with open(os.path.join(directory, name)) as f:
                out[name] = f.read()
    return out


def script_suffix(filename: str) -> str:
    """Strip the ``nw_`` / ``sf_dw_`` convention prefix and the extension
    so counterparts share a key (J5's derived-suffix join)."""
    base = os.path.splitext(os.path.basename(filename))[0]
    return re.sub(r"^(nw_|sf_dw_)", "", base)


def pair_scripts(
    hive_dir: str, sf_dir: str
) -> dict[str, tuple[str | None, str | None]]:
    """suffix → (hive_content, sf_content); one side may be missing."""
    hive = {script_suffix(n): c for n, c in read_script_dir(hive_dir).items()}
    sf = {script_suffix(n): c for n, c in read_script_dir(sf_dir).items()}
    return {
        k: (hive.get(k), sf.get(k)) for k in sorted(set(hive) | set(sf))
    }
