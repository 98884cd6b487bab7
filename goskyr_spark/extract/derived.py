"""Derived fields (F13): template- or regex-based field derivation.

Re-implements ``/root/reference/scrape/template.go``:

* ``parse_template_pattern`` — :158-185 (consistent single delimiter,
  last symbol absorbs overflow)
* ``parse_regex_input``      — :188-207 (named capture groups)
* ``OutputCondition.evaluate`` — :210-246
* ``apply_derived_fields``   — :249-295
"""

from __future__ import annotations

import re

from ..config.model import DerivedField as DerivedFieldCfg
from .text import ExtractError


def parse_template_pattern(template: str) -> tuple[list[str], str]:
    symbol_re = re.compile(r"\{([^}]+)\}")
    matches = list(symbol_re.finditer(template))
    if not matches:
        raise ExtractError(f"no symbols found in template {template!r}")
    symbols = []
    delimiters = []
    last_end = 0
    for i, m in enumerate(matches):
        if i > 0:
            delimiters.append(template[last_end : m.start()])
        symbols.append(m.group(1))
        last_end = m.end()
    if not delimiters:
        return symbols, ""
    delim = delimiters[0]
    for d in delimiters:
        if d != delim:
            raise ExtractError(
                f"mixed delimiters in template: {delim!r} vs {d!r} (use regex for complex patterns)"
            )
    return symbols, delim


def parse_template_input(symbols: list[str], delimiter: str, input_str: str) -> dict[str, str]:
    result: dict[str, str] = {}
    if delimiter == "":
        if len(symbols) == 1:
            result[symbols[0]] = input_str.strip()
        return result
    parts = input_str.split(delimiter)
    for i, sym in enumerate(symbols):
        if i < len(parts):
            if i == len(symbols) - 1 and len(parts) > len(symbols):
                result[sym] = delimiter.join(parts[i:]).strip()
            else:
                result[sym] = parts[i].strip()
        else:
            result[sym] = ""
    return result


def parse_regex_input(pattern: str, input_str: str) -> dict[str, str]:
    rex = re.compile(pattern)
    m = rex.search(input_str)  # Go FindStringSubmatch == first match anywhere
    if m is None:
        return {}
    return {name: (m.group(name) or "").strip() for name in rex.groupindex}


def evaluate_condition(cond, value: str) -> bool:
    if cond is None:
        return True
    equals = getattr(cond, "equals", "") or ""
    not_equals = getattr(cond, "not_equals", "") or ""
    matches = getattr(cond, "matches", "") or ""
    not_matches = getattr(cond, "not_matches", "") or ""
    ci = bool(getattr(cond, "case_insensitive", False))
    test = value.lower() if ci else value
    if equals and test != (equals.lower() if ci else equals):
        return False
    if not_equals and test == (not_equals.lower() if ci else not_equals):
        return False
    flags = "(?i)" if ci else ""
    if matches and not re.search(flags + matches, value):
        return False
    if not_matches and re.search(flags + not_matches, value):
        return False
    return True


def apply_derived_fields(derived_fields: list[DerivedFieldCfg], rec: dict) -> None:
    for df in derived_fields:
        source_val = rec.get(df.source)
        if not isinstance(source_val, str):
            continue
        if getattr(df, "template", "") or df.pattern:
            template = getattr(df, "template", "") or df.pattern
            symbols, delim = parse_template_pattern(template)
            extracted = parse_template_input(symbols, delim, source_val)
        elif df.regex:
            extracted = parse_regex_input(df.regex, source_val)
        else:
            raise ExtractError("DerivedField requires either template or regex")
        for out in df.outputs:
            if out.symbol not in extracted:
                continue
            value = extracted[out.symbol]
            if not evaluate_condition(out.condition, value):
                continue
            final = out.value if out.value else value
            if final != "":
                rec[out.target] = final
