"""Version helper (parity surface: reference spateo/get_version.py, a
vendored copy of flying-sheep/get_version). Resolution order: git describe
on the source tree, then the installed distribution metadata, then the
static fallback."""

from __future__ import annotations

import os
import re
from pathlib import Path
from subprocess import PIPE, CalledProcessError, run
from typing import Optional, Union

__version__ = "0.1.0"

RE_GIT_DESCRIBE = r"v?(?:([\d.]+)(?:-(\d+)-g([0-9a-f]{7,}))?|([0-9a-f]{7,}))(-dirty)?$"


def get_version_from_git(parent: Path) -> Optional[str]:
    try:
        p = run(
            ["git", "describe", "--tags", "--dirty", "--always"],
            cwd=str(parent),
            stdout=PIPE,
            stderr=PIPE,
            encoding="utf-8",
            check=True,
        )
    except (OSError, CalledProcessError):
        return None
    # forms: "v1.2.3", "v1.2.3-5-gabcdef1", "abcdef1", each with
    # optional "-dirty"
    match = re.match(RE_GIT_DESCRIBE, p.stdout.strip())
    if not match:
        return None
    release, dev, hex_, bare_hex, dirty = match.groups()
    version = release or "0.1.0"
    if dev and dev != "0":
        version += f".dev{dev}+{hex_}"
    if dirty:
        version += ".dirty" if dev and dev != "0" else "+dirty"
    return version


def get_version_from_metadata(name: str) -> Optional[str]:
    try:
        from importlib.metadata import PackageNotFoundError, version
    except ImportError:
        return None
    try:
        return version(name)
    except PackageNotFoundError:
        return None


def get_version(package: Union[Path, str]) -> str:
    """Version of the package owning `package` (a module `__file__`)."""
    path = Path(package)
    name = path.parent.name if path.name.startswith("__init__") else path.stem
    if os.environ.get("READTHEDOCS") != "True":
        v = get_version_from_git(path.parent)
        if v:
            return v
    return get_version_from_metadata(name) or __version__
