"""Mechanical change-detection for registered queries.

The external correctness gate samples only the first
``registry.DRIVER_WINDOW`` registered queries, so the registry keeps a
WINDOW CONTRACT: any query whose behavior changed since its last
externally-verified state must sit inside the window.  Round 3 tracked
"changed" with a hand-curated list, which silently breaks the moment a
contributor edits a query and forgets the list.

This module replaces the curated list with a fingerprint: for every
registered query we hash

* the query function's own source,
* the source of every in-package function/class it (transitively)
  references — so a change in ``operators/dedup.py`` marks every query
  that calls into it, not just queries whose own file changed,
* the ``repr`` of in-package module-level constants it references
  (tuning knobs like band counts change behavior without changing any
  function body),
* the oracle SQL text.

``scripts/gen_manifest.py`` snapshots the fingerprints of the last
externally-verified tree into ``tests/query_manifest.json``;
``tests/test_registry_contract.py`` asserts any drifted-or-new query is
inside the driver window.  The snapshot is regenerated only at a round
boundary, from the tree the driver actually verified.
"""

from __future__ import annotations

import ast
import hashlib
import inspect
import re
import textwrap
import types
from typing import Any

PACKAGE_PREFIX = __name__.rsplit(".", 1)[0]  # "hypertension_dashboard_pipeline_spark"

_CONST_TYPES = (str, bytes, int, float, bool, tuple, frozenset, type(None))

# Infrastructure modules whose objects are NOT query behavior: every
# query's source includes its ``@register`` decorator line, and walking
# into the registry would (a) couple every fingerprint to every other
# query via the QUERIES/ORACLES dicts and (b) hash function reprs with
# memory addresses — nondeterministic.
_EXCLUDED_MODULES = {PACKAGE_PREFIX + ".registry", PACKAGE_PREFIX + ".manifest"}


def _in_package(mod_name: str | None) -> bool:
    return (
        bool(mod_name)
        and (mod_name == PACKAGE_PREFIX or mod_name.startswith(PACKAGE_PREFIX + "."))
        and mod_name not in _EXCLUDED_MODULES
    )


def _referenced_names(src: str) -> tuple[set[str], set[tuple[str, str]]]:
    """Names and one-level ``module.attr`` chains referenced in *src*."""
    tree = ast.parse(textwrap.dedent(src))
    names: set[str] = set()
    attrs: set[tuple[str, str]] = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Name):
            names.add(node.id)
        elif isinstance(node, ast.Attribute) and isinstance(node.value, ast.Name):
            attrs.add((node.value.id, node.attr))
    return names, attrs


def _source_of(obj: Any) -> str | None:
    try:
        return inspect.getsource(obj)
    except (OSError, TypeError):
        return None


def _walk(obj: Any, seen: set[str], parts: dict[str, str]) -> None:
    """Accumulate ``{sort_key: source_or_repr}`` for *obj* and every
    in-package object it references, recursively."""
    if isinstance(obj, (types.FunctionType, type)):
        mod_name = getattr(obj, "__module__", None)
        if not _in_package(mod_name):
            return
        key = f"{mod_name}.{getattr(obj, '__qualname__', obj.__name__)}"
        if key in seen:
            return
        seen.add(key)
        src = _source_of(obj)
        if src is None:
            return
        parts[key] = src
        g = getattr(obj, "__globals__", None)
        if g is None:  # a class: resolve names in its defining module
            import sys

            mod = sys.modules.get(mod_name)
            g = vars(mod) if mod is not None else {}
        names, attrs = _referenced_names(src)
        for name in names:
            if name in g:
                _resolve(g[name], f"{mod_name}.{name}", seen, parts)
        for base, attr in attrs:
            val = g.get(base)
            if isinstance(val, types.ModuleType) and _in_package(val.__name__):
                if hasattr(val, attr):
                    _resolve(
                        getattr(val, attr), f"{val.__name__}.{attr}", seen, parts
                    )


def _resolve(val: Any, key: str, seen: set[str], parts: dict[str, str]) -> None:
    if isinstance(val, (types.FunctionType, type)):
        _walk(val, seen, parts)
    elif isinstance(val, _CONST_TYPES) and not isinstance(val, types.ModuleType):
        if key not in seen:
            seen.add(key)
            parts[key] = repr(val)
    elif isinstance(val, (list, dict, set)):
        if key not in seen:
            seen.add(key)
            # Hash container CONTENTS only for constant-like containers
            # (tuning knobs: band lists, stopword sets...).  A container
            # holding non-constants is runtime state (e.g. the dedup
            # module's persisted-DataFrame bookkeeping list) — its
            # contents vary with what already RAN in this process, which
            # must never change a query's fingerprint.
            items = list(val.values()) + list(val) if isinstance(val, dict) else list(val)
            # non-empty AND all-constant: empty is ambiguous (a runtime
            # list starts empty and must not change hash when it fills)
            if items and all(isinstance(x, _CONST_TYPES) for x in items):
                try:
                    parts[key] = (
                        repr(sorted(val)) if isinstance(val, set) else repr(val)
                    )
                except TypeError:
                    parts[key] = repr(val)
            else:
                parts[key] = "<mutable-runtime-state>"


def fingerprint(fn: types.FunctionType, oracle: str | None) -> str:
    seen: set[str] = set()
    parts: dict[str, str] = {}
    _walk(fn, seen, parts)
    h = hashlib.sha256()
    for key in sorted(parts):
        h.update(key.encode())
        h.update(b"\x00")
        # belt-and-braces: object reprs embed memory addresses
        h.update(re.sub(r" at 0x[0-9a-f]+", " at 0xADDR", parts[key]).encode())
        h.update(b"\x01")
    h.update(b"ORACLE\x00")
    h.update((oracle or "<none>").encode())
    return h.hexdigest()


def query_fingerprints() -> dict[str, str]:
    """Fingerprint every registered query (loads the registry)."""
    from . import registry

    registry.load_all()
    return {
        name: fingerprint(fn, registry.ORACLES.get(name))
        for name, fn in registry.QUERIES.items()
    }
