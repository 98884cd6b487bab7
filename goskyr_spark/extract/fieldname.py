"""Field-name hashing/parsing (F15) — ``/root/reference/scrape/fieldname.go``.

Note the reference has TWO formats: the generator's ``setFieldNames``
uses unpadded ``F%x`` (``locationprops.go:96``, what golden configs
contain), while this public API pads to 8 hex chars (``F%08x``,
``fieldname.go:45-52``). Both use CRC32-IEEE of the trimmed selector
path."""

from __future__ import annotations

import re
import zlib
from dataclasses import dataclass

FIELD_NAME_FORMAT = "F<hash>[-<attr>]-<textnode>"

_FIELD_NAME_RE = re.compile(r"^F([0-9a-f]{8})-([a-z_]*)-(\d+)$")


def compute_field_hash(selector_path: str) -> str:
    """ComputeFieldHash (fieldname.go:45-52): CRC32-IEEE, 8 hex chars."""
    return f"{zlib.crc32(selector_path.strip().encode()):08x}"


def generate_field_name(selector_path: str, attr: str, text_node_index: int) -> str:
    """GenerateFieldName (fieldname.go:62-70)."""
    h = compute_field_hash(selector_path)
    if attr == "":
        return f"F{h}--{text_node_index}"
    return f"F{h}-{attr}-{text_node_index}"


@dataclass
class FieldNameComponents:
    hash: str
    attribute: str
    text_node_index: int


def parse_field_name(name: str):
    """ParseFieldName (fieldname.go:89-108) → (components, ok)."""
    m = _FIELD_NAME_RE.match(name)
    if m is None:
        return FieldNameComponents("", "", 0), False
    return FieldNameComponents(m.group(1), m.group(2), int(m.group(3))), True


def is_goskyr_field_name(name: str) -> bool:
    return parse_field_name(name)[1]
