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
* the STATIC source text of the top-level assignment of every
  in-package module-level value it references (tuning knobs like band
  counts change behavior without changing any function body; hashing
  assignment SOURCE rather than runtime ``repr`` keeps runtime-state
  globals — persisted-DataFrame lists, tmp-dir bookkeeping, rebound
  caches — from changing a fingerprint based on what already ran in
  this process),
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


def _relative_base(mod_name: str, level: int) -> str:
    """Absolute package a ``from ...x import`` with *level* dots resolves
    against, from inside *mod_name*.  A package's ``__init__`` resolves
    level-1 imports against ITSELF (``pkg.sub`` + ``from .x`` ->
    ``pkg.sub.x``), a plain module against its parent (``pkg.sub.mod`` +
    ``from .x`` -> ``pkg.sub.x``) — so strip ``level - 1`` components
    for a package and ``level`` for a module."""
    import sys

    mod = sys.modules.get(mod_name)
    is_pkg = hasattr(mod, "__path__") if mod is not None else False
    strip = level - 1 if is_pkg else level
    return mod_name if strip <= 0 else mod_name.rsplit(".", strip)[0]


def _referenced_names(
    src: str, mod_name: str | None = None
) -> tuple[set[str], set[tuple[str, str]], set[tuple[str, str, str]]]:
    """Names, one-level ``module.attr`` chains, and ``from X import y``
    targets (as absolute ``(origin_module, name, bound_as)`` triples)
    referenced in *src*.  Import-froms are collected at ANY nesting
    depth: a function-body-local ``from .functions.expressions import
    round_fixed`` binds a local name invisible in ``__globals__``, so
    globals-based resolution alone would silently miss the dependency
    (measured: emb_gram_matrix / text_lm_bigram_score /
    sim_pq_adc_topk / streaming_incremental_rollup did not drift on a
    round_fixed edit before this pass existed)."""
    tree = ast.parse(textwrap.dedent(src))
    names: set[str] = set()
    attrs: set[tuple[str, str]] = set()
    import_froms: set[tuple[str, str, str]] = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Name):
            names.add(node.id)
        elif isinstance(node, ast.Attribute) and isinstance(node.value, ast.Name):
            attrs.add((node.value.id, node.attr))
        elif isinstance(node, ast.ImportFrom) and mod_name is not None:
            if node.level > 0:
                base = _relative_base(mod_name, node.level)
                origin = f"{base}.{node.module}" if node.module else base
            else:
                origin = node.module or ""
            if _in_package(origin):
                for a in node.names:
                    import_froms.add((origin, a.name, a.asname or a.name))
    return names, attrs, import_froms


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
        names, attrs, import_froms = _referenced_names(src, mod_name)
        # Body-local `from .x import y` bindings shadow (or add to) the
        # globals namespace for this function's source: resolve them
        # FIRST into a local view so `y` / `y.attr` references below hit
        # the imported object, not a same-named global (or nothing).
        local_bindings: dict[str, tuple[Any, str]] = {}
        if import_froms:
            import importlib

            for origin, name, bound_as in import_froms:
                try:
                    omod = importlib.import_module(origin)
                except ImportError:
                    continue
                if hasattr(omod, name):
                    local_bindings[bound_as] = (getattr(omod, name), f"{origin}.{name}")
                else:
                    # `from .operators import pq` where pq is a
                    # submodule not re-exported by the package __init__
                    try:
                        local_bindings[bound_as] = (
                            importlib.import_module(f"{origin}.{name}"),
                            f"{origin}.{name}",
                        )
                    except ImportError:
                        continue
        ns = {**g, **{k: v for k, (v, _) in local_bindings.items()}}
        for name in names:
            if name in local_bindings:
                val, key2 = local_bindings[name]
                _resolve(val, key2, seen, parts)
            elif name in g:
                _resolve(g[name], f"{mod_name}.{name}", seen, parts)
        for base, attr in attrs:
            val = ns.get(base)
            if isinstance(val, types.ModuleType) and _in_package(val.__name__):
                if hasattr(val, attr):
                    _resolve(
                        getattr(val, attr), f"{val.__name__}.{attr}", seen, parts
                    )


# per-module map {name: source text of its top-level assignment(s) /
# import statement} — the STATIC alternative to repr-hashing runtime
# values (cache key: module name; module source is immutable in-process)
_MODULE_ASSIGNMENTS: dict[str, dict[str, str]] = {}
# per-module map {imported name: (absolute origin module, original
# name)} for one-hop resolution of `from .x import CONST` bindings
_MODULE_IMPORT_ORIGINS: dict[str, dict[str, tuple[str, str]]] = {}


def _module_assignments(mod_name: str) -> dict[str, str]:
    """Source segments of every top-level binding in *mod_name*:
    plain/annotated assignments and import statements, keyed by bound
    name (multiple bindings concatenate in file order)."""
    cached = _MODULE_ASSIGNMENTS.get(mod_name)
    if cached is not None:
        return cached
    import sys

    out: dict[str, str] = {}
    origins: dict[str, tuple[str, str]] = {}
    mod = sys.modules.get(mod_name)
    src = _source_of(mod) if mod is not None else None
    if src is not None:
        tree = ast.parse(src)
        for node in tree.body:
            if isinstance(node, ast.Assign):
                names = [t.id for t in node.targets if isinstance(t, ast.Name)]
            elif isinstance(node, ast.AnnAssign) and isinstance(
                node.target, ast.Name
            ):
                names = [node.target.id]
            elif isinstance(node, ast.AugAssign) and isinstance(
                node.target, ast.Name
            ):
                names = [node.target.id]
            elif isinstance(node, (ast.Import, ast.ImportFrom)):
                names = [a.asname or a.name.split(".")[0] for a in node.names]
                if isinstance(node, ast.ImportFrom) and node.level >= 0:
                    if node.level > 0:
                        base = _relative_base(mod_name, node.level)
                        origin = (
                            f"{base}.{node.module}" if node.module else base
                        )
                    else:
                        origin = node.module or ""
                    if _in_package(origin):
                        for a in node.names:
                            origins[a.asname or a.name] = (origin, a.name)
            else:
                continue
            seg = ast.get_source_segment(src, node) or ""
            for n in names:
                out[n] = out.get(n, "") + seg + "\n"
    _MODULE_ASSIGNMENTS[mod_name] = out
    _MODULE_IMPORT_ORIGINS[mod_name] = origins
    return out


def _resolve(val: Any, key: str, seen: set[str], parts: dict[str, str]) -> None:
    if isinstance(val, (types.FunctionType, type)):
        _walk(val, seen, parts)
        return
    if isinstance(val, types.ModuleType):
        return
    if key in seen:
        return
    seen.add(key)
    # Non-callable module-level values hash by their STATIC top-level
    # assignment source, never their runtime repr.  Runtime repr looks
    # attractive for tuning knobs (band lists, stopword sets) but is
    # unsound: a runtime-state container that starts empty and fills
    # with strings (e.g. a tmp-dir bookkeeping list) passes any
    # "all-constant contents" heuristic and then changes a query's
    # fingerprint depending on what already RAN in this process — the
    # r5 failure mode (sim_lsh_bucket_topk_indexed drifted after its
    # own index build appended '/tmp/...' to _LSH_INDEX_DIRS).  The
    # assignment text is immutable in-process, still changes exactly
    # when a contributor edits the knob, and also covers rebound
    # singletons (cache = None -> DataFrame) uniformly.
    mod_name, _, name = key.rpartition(".")
    seg = _module_assignments(mod_name).get(name) if mod_name else None
    if seg is not None:
        # one-hop import resolution: `from .x import CONST` hashes the
        # import line AND the origin module's assignment of CONST, so
        # editing the constant upstream still drifts this query
        origin = _MODULE_IMPORT_ORIGINS.get(mod_name, {}).get(name)
        if origin is not None:
            oseg = _module_assignments(origin[0]).get(origin[1])
            if oseg is not None:
                seg = seg + oseg
        parts[key] = seg
    elif isinstance(val, _CONST_TYPES):
        # not a module-level binding (e.g. a closure cell or class
        # attribute reached by name): the value itself is immutable,
        # so repr is stable
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


def own_fingerprint(fn: types.FunctionType, oracle: str | None) -> str:
    """Hash of the query function's OWN source + oracle text only — no
    transitive callee closure.

    Companion to :func:`fingerprint` for the optimization rounds: a
    shared-operator optimization (io reader, join shape, expression
    construction) drifts the TRANSITIVE fingerprint of every consumer
    at once — far more queries than any driver window holds — while
    changing no query's own definition.  The window contract
    (tests/test_registry_contract.py) therefore distinguishes the two:
    own-source/oracle drift must be externally gated (inside the
    window); pure shared-callee drift is admissible outside it, because
    the local full-catalog parity sweep value-verifies every query
    against its oracle on every run and the optimization-round external
    gate re-verifies the full catalog."""
    h = hashlib.sha256()
    src = _source_of(fn) or "<no-source>"
    h.update(re.sub(r" at 0x[0-9a-f]+", " at 0xADDR", src).encode())
    h.update(b"\x00ORACLE\x00")
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


def query_own_fingerprints() -> dict[str, str]:
    """Own-source fingerprint of every registered query (see
    :func:`own_fingerprint`)."""
    from . import registry

    registry.load_all()
    return {
        name: own_fingerprint(fn, registry.ORACLES.get(name))
        for name, fn in registry.QUERIES.items()
    }
