"""Dead-config guard (VERDICT round-1 item #10): every leaf field in the
Parameters tree must be READ somewhere in the package (settings that lie
about behavior are worse than no settings). Grep-style structural check —
cheap, but it catches fields that exist only in settings.py."""

import re
import typing
from dataclasses import fields, is_dataclass
from pathlib import Path

import dynamicfuion_python_tpu.settings as settings_module
from dynamicfuion_python_tpu.settings import Parameters

PACKAGE = Path(__file__).resolve().parent.parent / "dynamicfuion_python_tpu"


def _leaf_fields(cls, prefix=""):
    hints = typing.get_type_hints(cls, vars(settings_module))
    for f in fields(cls):
        ftype = hints.get(f.name, f.type)
        if isinstance(ftype, type) and is_dataclass(ftype):
            yield from _leaf_fields(ftype, prefix + f.name + ".")
        else:
            yield prefix + f.name, f.name


def test_every_settings_leaf_is_read():
    source = "\n".join(
        p.read_text()
        for p in PACKAGE.rglob("*.py")
        if p.name != "settings.py"
    )
    missing = []
    for dotted, leaf in _leaf_fields(Parameters):
        # read as attribute access (p.fusion.depth_scale etc.)
        if not re.search(rf"\.{re.escape(leaf)}\b", source):
            missing.append(dotted)
    assert not missing, (
        f"settings fields never read by any code: {missing} — implement "
        "them or delete them from settings.py"
    )
