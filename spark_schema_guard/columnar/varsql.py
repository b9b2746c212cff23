"""SQL-text compiler for VARIANT value schemas.

The variant rule world (open-key value schemas, exact-typed declared
fields, and now depth-bounded recursive ``$ref``) used to build Spark
Column objects node by node — one py4j round-trip per expression node.
That is fine for small schemas but explodes for recursion-heavy ones:
unrolling the draft-04 metaschema ONE level deep costs ~1.45M py4j calls
(~270 s of driver time) for a plan whose logic is a few hundred KB of
SQL.  This module generates the SAME rule triples as SQL text — Python
string concatenation, zero py4j — and the boundary wraps each finished
rule in a single ``F.expr`` (one JVM parse per rule).

Semantics are a 1:1 mirror of the reference validator's keyword order
and messages (fastjsonschema draft04.py:42-68 keyword registration;
message templates throughout) — the same contract the Column builder
carried, pinned by the columnar conformance replay and the differential
fuzz suites.

``_VariantSQLMixin`` is mixed into ``compiler._PlanCompiler``; it reads
the compiler's option fields (keyword_order, format_table,
ref_unroll_depth, canon_depth, ...) and its SchemaStore.
"""

from __future__ import annotations

import decimal
import math
import re

from ..exceptions import SchemaDefinitionError
from ..formats import jvm_pattern
from ..rowcheck.compiler import (_UNESCAPED_DOLLAR, ref_numeric,
                                 schema_value_repr)

VIOL_STRUCT_SQL = "STRUCT<name:STRING,rule:STRING,message:STRING>"


def sqlstr(s: str) -> str:
    """SQL string literal (Spark's default backslash-escaping parser)."""
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


def sqlnum(x) -> str:
    """SQL literal matching F.lit semantics: ints are BIGINT literals,
    floats DOUBLE literals (bare ``1.5`` would parse as DECIMAL),
    Decimals exact DECIMAL literals (collapsing a Decimal bound to
    ``repr(float(...))`` flips verdicts for values inside the double
    ulp of the bound — e.g. ``minimum: Decimal('1e18') + 0.1`` vs a
    BIGINT 10^18)."""
    if isinstance(x, bool):
        x = int(x)
    if isinstance(x, int):
        if -(2 ** 63) <= x <= 2 ** 63 - 1:
            return f"{x}L"
        # out-of-long integer literal: exact decimal, like F.lit(Decimal)
        return f"CAST('{x}' AS DECIMAL(38,0))"
    if isinstance(x, decimal.Decimal) and x.is_finite():
        _, digits, exp = x.as_tuple()
        scale = max(0, -exp)
        precision = max(len(digits) + max(exp, 0), scale + 1)
        if precision <= 38:
            return f"CAST('{x}' AS DECIMAL({precision},{scale}))"
        x = float(x)  # beyond DecimalType range: double, like F.lit
    if math.isnan(x):
        return "double('NaN')"
    if math.isinf(x):
        return "double('Infinity')" if x > 0 else "double('-Infinity')"
    return repr(float(x)) + "D"


class _NestedSQL:
    """Marker in the rule-id slot of a triple: the violation struct
    (name/rule/message) comes pre-built from a nested value's own
    first-failing rule.  ``gate_sql`` is the presence condition WITHOUT
    the struct-non-null test, letting :meth:`_violation_sql` embed the
    struct exactly once per level (a coalesce chain) instead of twice
    (condition + value) — the difference between exponential and linear
    plan size in the nesting depth."""

    __slots__ = ("struct_sql", "gate_sql")

    def __init__(self, struct_sql: str, gate_sql: str):
        self.struct_sql = struct_sql
        self.gate_sql = gate_sql


class _Views:
    """Typed projections of one VARIANT value as SQL text.  ``str_mode``
    freezes the value as a known STRING (propertyNames keys): the type
    tag is a literal and every non-string view a typed NULL, so Catalyst
    folds the non-string branches away."""

    __slots__ = ("v", "sov", "num", "lng", "s", "b", "arr", "obj",
                 "okeys", "vnull", "present")

    def __init__(self, v_sql: str, sov_sql: str | None = None,
                 str_mode: bool = False):
        self.v = v_sql
        if str_mode:
            self.sov = "'STRING'"
            self.num = "CAST(NULL AS DOUBLE)"
            self.lng = "CAST(NULL AS BIGINT)"
            self.s = v_sql
            self.b = "CAST(NULL AS BOOLEAN)"
            self.arr = "CAST(NULL AS ARRAY<VARIANT>)"
            self.obj = "CAST(NULL AS MAP<STRING,VARIANT>)"
            self.vnull = "false"
            self.present = f"({v_sql} IS NOT NULL)"
        else:
            self.sov = sov_sql or f"schema_of_variant({v_sql})"
            self.num = f"try_variant_get({v_sql}, '$', 'double')"
            self.lng = f"try_variant_get({v_sql}, '$', 'long')"
            self.s = f"try_variant_get({v_sql}, '$', 'string')"
            self.b = f"try_variant_get({v_sql}, '$', 'boolean')"
            self.arr = f"try_variant_get({v_sql}, '$', 'array<variant>')"
            self.obj = (f"try_variant_get({v_sql}, '$', "
                        "'map<string,variant>')")
            self.vnull = f"is_variant_null({v_sql})"
            self.present = f"({v_sql} IS NOT NULL)"
        self.okeys = f"map_keys({self.obj})"

    @property
    def is_num(self):
        return (f"({self.sov} = 'BIGINT' OR {self.sov} = 'DOUBLE' "
                f"OR startswith({self.sov}, 'DECIMAL'))")

    @property
    def is_numlike(self):
        return f"({self.is_num} OR {self.sov} = 'BOOLEAN')"

    @property
    def is_bigint(self):
        return f"({self.sov} = 'BIGINT')"

    @property
    def is_str(self):
        return f"({self.sov} = 'STRING')"

    @property
    def is_intdec(self):
        """Integral DECIMAL tag: a JSON integer beyond long range
        (``10000000000000000000`` parses as DECIMAL(20,0)).  Fractional
        decimals keep nonzero scale and stay on the double view —
        matching the reference, where json.loads already made them
        Python floats."""
        return (f"(startswith({self.sov}, 'DECIMAL') "
                f"AND endswith({self.sov}, ',0)'))")

    @property
    def is_arr(self):
        return f"startswith({self.sov}, 'ARRAY')"

    @property
    def is_obj(self):
        return f"startswith({self.sov}, 'OBJECT')"


class _PackCtx:
    """Where the value currently being compiled sits RELATIVE TO its
    recursion-level root — enough information to enumerate, at level
    scope, every value a recursion site ranges over (the kid segment)
    and to correlate an inner lambda's value back to its packed result.

    Packed recursion (SCALE.md jsoncol section): SQL text's only
    sharing mechanism is a lambda applied over an array, so instead of
    re-inlining a recursive ``$ref``'s body at every site (text(d) =
    B + sites·text(d-1), exponential), each level collects every
    site's values into ONE tagged array and applies the child body
    once via ``transform`` (text(d) = B + text(d-1), linear).  A ctx
    exists only while the value is reachable from the level root
    through static hops plus AT MOST ONE collection hop (array
    elements or object entries) — deeper sites fall back to the
    classic inline unroll (correct, just bigger)."""

    __slots__ = ()

    def replace(self, val: str, name: str):
        raise NotImplementedError


class _PackSingle(_PackCtx):
    """A single level-scope value (level root, or a static property /
    positional-item hop below one)."""

    __slots__ = ("val", "name")

    def __init__(self, val: str, name: str):
        self.val = val
        self.name = name

    def replace(self, val, name):
        return _PackSingle(val, name)

    def corr(self, rv: str) -> str:
        return ""

    def segment(self, tag: int, cidx: int) -> str:
        return (f"array(named_struct('t', {tag}, 'c', {cidx}, "
                f"'i', 0, 'k', '', "
                f"'v', {self.val}, 'nm', {self.name}))")


class _PackArray(_PackCtx):
    """Every element of a level-scope array (``items`` /
    ``additionalItems`` hop).  ``val``/``name`` are templates over the
    segment's own lambda vars ``(sx, si)``; ``inner_i`` is the
    CONSUMING check lambda's index var, correlated via the kid's ``i``
    field."""

    __slots__ = ("coll", "sx", "si", "val", "name", "inner_i")

    def __init__(self, coll, sx, si, val, name, inner_i):
        self.coll = coll
        self.sx = sx
        self.si = si
        self.val = val
        self.name = name
        self.inner_i = inner_i

    def replace(self, val, name):
        return _PackArray(self.coll, self.sx, self.si, val, name,
                          self.inner_i)

    def corr(self, rv: str) -> str:
        return f" AND {rv}.i = {self.inner_i}"

    def segment(self, tag: int, cidx: int) -> str:
        # coalesce: a non-array value makes the collection NULL, and a
        # NULL leg would NULL the whole concat'd kid array (silent pass)
        return (f"coalesce(transform({self.coll}, "
                f"({self.sx}, {self.si}) -> "
                f"named_struct('t', {tag}, 'c', {cidx}, "
                f"'i', {self.si}, 'k', '', "
                f"'v', {self.val}, 'nm', {self.name})), array())")


class _PackEntries(_PackCtx):
    """Every (filtered) entry value of a level-scope object
    (``additionalProperties`` / ``patternProperties`` hop); correlated
    by map key (unique within an object)."""

    __slots__ = ("entries", "se", "filt", "val", "name", "inner_key")

    def __init__(self, entries, se, filt, val, name, inner_key):
        self.entries = entries
        self.se = se
        self.filt = filt
        self.val = val
        self.name = name
        self.inner_key = inner_key

    def replace(self, val, name):
        return _PackEntries(self.entries, self.se, self.filt, val, name,
                            self.inner_key)

    def corr(self, rv: str) -> str:
        return f" AND {rv}.k = {self.inner_key}"

    def segment(self, tag: int, cidx: int) -> str:
        src = self.entries
        if self.filt is not None:
            src = f"filter({src}, {self.se} -> {self.filt})"
        # coalesce: a non-object value makes map_entries NULL, and a
        # NULL leg would NULL the whole concat'd kid array (silent pass)
        return (f"coalesce(transform({src}, {self.se} -> "
                f"named_struct('t', {tag}, 'c', {cidx}, "
                f"'i', 0, 'k', {self.se}.key, "
                f"'v', {self.val}, 'nm', {self.name})), array())")


def _derive_ctx(ctx, val_fn, name_fn):
    """Static value hop under a pack ctx: compose the accessor into the
    ctx's value/name templates (``val_fn(level_views) -> value text``,
    ``name_fn(parent_name_text) -> name text``)."""
    if ctx is None:
        return None
    lv = _Views(ctx.val)
    return ctx.replace(val_fn(lv), name_fn(ctx.name))


class _PackGroup:
    """One recursion COMPONENT's packed sites within one level frame.
    ``comp`` is the sorted tuple of mutually-recursive canonicals; the
    shared child body dispatches on the kid's member index, so the
    whole component costs ONE body per level (text linear in depth).
    Full and probe sites share the body: a probe consumes
    ``viol IS NULL`` (equivalent to its pass boolean — _violation_sql
    yields a struct iff some triple fails)."""

    __slots__ = ("rsvar", "comp", "stack", "segments")

    def __init__(self, rsvar, comp, stack):
        self.rsvar = rsvar
        self.comp = comp
        self.stack = stack
        self.segments: list = []


class _PackFrame:
    __slots__ = ("groups",)

    def __init__(self):
        self.groups: dict = {}


def _nf(x: str) -> str:
    """NULL-as-false coalesce (compiler._null_false)."""
    return f"coalesce({x}, false)"


_CANON_V = "__CANON_V__"

# scalar JSON literals get_json_object cannot see (mirrors the typed
# path's _kw_content_media_type literal_ok regex)
_JSON_LITERAL_RE = (r"^\s*(-?\d+(\.\d+)?([eE][+-]?\d+)?|true|false|null|\".*\")\s*$")


class _VariantSQLMixin:
    """SQL-text twins of the Column-building variant rule methods.

    Reads from the host compiler: ``store``, ``keyword_order``,
    ``format_table``, ``custom_formats``, ``use_formats``,
    ``integral_float_is_int``, ``regex_engine``, ``ref_unroll_depth``,
    ``on_depth_exceeded``, ``canon_depth``, ``_vref_budget``,
    ``_vref_stack``, ``_v_base_uri``."""

    # -- plumbing ----------------------------------------------------------

    def _plan_unsupported(self, message: str):
        from .compiler import PlanUnsupported
        raise PlanUnsupported(message)

    def _plan_too_large(self, message: str):
        from .compiler import PlanTooLarge
        raise PlanTooLarge(message)

    def _vsql_var(self, hint: str = "x") -> str:
        """Fresh lambda-variable name (text world controls its names)."""
        self._vsql_n = getattr(self, "_vsql_n", 0) + 1
        return f"__{hint}{self._vsql_n}"

    def _vsql_spend(self, text: str) -> str:
        """Account generated text against the plan-size guard: a plan
        too large to analyze/codegen should fail AT COMPILE TIME with a
        clean PlanUnsupported (engine='auto' falls back to the python
        engine) instead of stalling the driver."""
        self._vsql_chars = getattr(self, "_vsql_chars", 0) + len(text)
        if self._vsql_chars > self._vsql_char_budget:
            self._plan_too_large(
                "columnar plan text exceeds the size budget "
                f"({self._vsql_char_budget} chars) — recursion unrolling "
                "is too large for expression form; raise plan_text_budget "
                "or use engine='python'")
        return text

    # -- packed recursion ---------------------------------------------------

    @property
    def _vpack_frames(self):
        frames = getattr(self, "_vpack_frames_", None)
        if frames is None:
            frames = self._vpack_frames_ = []
        return frames

    def _vref_graph_scan(self, canonical, target, doc_uri) -> None:
        """Record ``canonical``'s direct $ref edges (and, transitively,
        every canonical it can reach) in ``self._vref_edges`` /
        ``self._vref_targets``.  Conservative walk over every nested
        dict/list, so a $ref-shaped DATA literal inside enum/const may
        add an edge — harmless: packing a non-recursive ref is correct,
        just unnecessary."""
        edges = getattr(self, "_vref_edges", None)
        if edges is None:
            edges = self._vref_edges = {}
            self._vref_targets = {}
        if canonical in edges:
            return
        self._vref_targets[canonical] = (target, doc_uri)
        out: dict = {}

        def walk(defn, base):
            if isinstance(defn, dict):
                ref = defn.get("$ref")
                if isinstance(ref, str):
                    try:
                        t, uri, canon = self.store.resolve(ref, base)
                    except Exception:
                        return
                    out.setdefault(canon, (t, uri))
                    return
                for v in defn.values():
                    walk(v, base)
                return
            if isinstance(defn, (list, tuple)):
                for v in defn:
                    walk(v, base)

        walk(target, doc_uri)
        edges[canonical] = frozenset(out)
        for canon2, (t2, uri2) in out.items():
            self._vref_graph_scan(canon2, t2, uri2)

    def _vref_component(self, canonical, target, doc_uri) -> tuple:
        """The recursion component of ``canonical``: the sorted tuple of
        canonicals on a $ref cycle through it — empty when the ref is
        not recursive at all.  One packed group (and ONE shared dispatch
        body per level) serves the whole component; per-member chains
        under mutual recursion would re-create the exponential
        branching packing exists to remove."""
        memo = getattr(self, "_vref_comp_memo", None)
        if memo is None:
            memo = self._vref_comp_memo = {}
        if canonical in memo:
            return memo[canonical]
        self._vref_graph_scan(canonical, target, doc_uri)
        edges = self._vref_edges
        # transitive closure by worklist (the scanned graph is small)
        reach = {c: set(edges.get(c, ())) for c in edges}
        changed = True
        while changed:
            changed = False
            for c, r in reach.items():
                add = set()
                for d in r:
                    add |= reach.get(d, set())
                if not add <= r:
                    r |= add
                    changed = True
        for c in edges:
            if c in reach.get(c, ()):
                memo[c] = tuple(sorted(
                    d for d in reach[c] | {c}
                    if c in reach.get(d, ()) and d in reach.get(d, ())))
            else:
                memo[c] = ()
        return memo[canonical]

    def _vpack_global_frame(self) -> _PackFrame:
        """The ONE frame shared by every top-level compile site: its
        groups' result arrays become helper (aux) columns at
        ``_vpack_flush``, so all top-level sites of a recursion target
        share a single packed chain instead of one chain per declared
        property."""
        fr = getattr(self, "_vpack_global_", None)
        if fr is None:
            fr = self._vpack_global_ = _PackFrame()
        return fr

    def _vpack_register(self, canonical, target, doc_uri, ctx, w,
                        pass_only):
        """Register one recursion site in the innermost level frame and
        return the triple that reads its packed result.  The site's
        values join the group's kid array; the shared child body
        compiles EAGERLY on group creation (so an unsupported target
        raises inside the caller's try/fallback) and the kid array is
        assembled at frame finalize (``_vpack_child_sql``)."""
        frame = self._vpack_frames[-1]
        # one group per recursion COMPONENT: under mutual recursion,
        # per-canonical (or per-stack, or per-mode) groups each spawn
        # their own chains and the branching re-creates the exponential
        # blowup packing exists to kill.  Merged sites share the FIRST
        # registration's stack; the shared body bounds recursion at
        # ref_unroll_depth chain LEVELS (each level pushes every
        # component member once) — for single-ref recursion exactly the
        # inline depth, for ref cycles a uniform level bound instead of
        # the inline form's per-canonical path counting.
        comp = self._vref_component(canonical, target, doc_uri)
        group = frame.groups.get(comp)
        if group is None:
            self._vsql_n += 1
            top = frame is getattr(self, "_vpack_global_", None)
            rsvar = (f"`__vrs{self._vsql_n}_pack__`" if top
                     else f"__vrs{self._vsql_n}")
            group = _PackGroup(rsvar, comp, list(self._vref_stack))
            frame.groups[comp] = group
        _, lengths, _ = self._vpack_body(group)
        cidx = comp.index(canonical)
        tag = len(group.segments)
        group.segments.append(ctx.segment(tag, cidx))
        self._vref_budget -= 1
        rv = self._vsql_var("r")
        corr = ctx.corr(rv)
        if pass_only:
            yv = self._vsql_var("y")
            fail = (f"exists({group.rsvar}, {rv} -> "
                    f"({rv}.t = {tag}{corr} AND exists({rv}.viols, "
                    f"{yv} -> {yv} IS NOT NULL)))")
            return [(None, "NULL", self._vsql_spend(fail))]
        # one triple per target-body slot: the inline expansion returns
        # the target's full triple list, and top-level consumers build
        # one RULE per triple — collect-all output must match
        sel = (f"try_element_at(filter({group.rsvar}, {rv} -> "
               f"({rv}.t = {tag}{corr})), 1).viols")
        out = []
        for j in range(lengths[cidx]):
            # try_element_at, not [..]: subscripting would throw on an
            # out-of-bound index under ANSI mode instead of NULLing
            struct = f"try_element_at({sel}, {j + 1})"
            out.append((_NestedSQL(struct, "true"),
                        "CAST(NULL AS STRING)",
                        self._vsql_spend(f"(({struct}) IS NOT NULL)")))
        return out

    def _vpack_child_sql(self, group: _PackGroup) -> str:
        """The group's packed result array: kids (the concatenated tagged
        segments) mapped through ONE instance of the recursion target's
        body — compiled at the ref-stack depth the inline expansion
        would have used, with its OWN frame so deeper recursion packs
        again (the linear chain).

        The body lambda (everything but the group-specific kid array) is
        MEMOIZED on (canonical, mode, per-canonical stack counts) — the
        only stack property the compile consults is ``count(c)``, so two
        groups at the same depth profile share one body text and the
        many per-top-site chains collapse onto one body set."""
        kvar, _lengths, body = self._vpack_body(group)
        kids = group.segments[0] if len(group.segments) == 1 \
            else "concat(" + ", ".join(group.segments) + ")"
        return self._vsql_spend(
            f"transform({kids}, {kvar} -> named_struct("
            f"'t', {kvar}.t, 'i', {kvar}.i, 'k', {kvar}.k, "
            f"'viols', {body}))")

    def _vpack_body(self, group: _PackGroup):
        """Compile (memoized) the component's shared dispatch body as a
        (kvar, violation-struct-text) closed check over one kid."""
        memo = getattr(self, "_vpack_body_memo", None)
        if memo is None:
            memo = self._vpack_body_memo = {}
        stack = list(group.stack) + list(group.comp)
        counts = {}
        for c in stack:
            counts[c] = counts.get(c, 0) + 1
        mkey = (group.comp, tuple(sorted(counts.items())))
        cached = memo.get(mkey)
        if cached is None:
            kvar = self._vsql_var("k")
            saved_stack = self._vref_stack
            saved_base = self._v_base_uri
            self._vref_stack = stack
            self._vpack_frames.append(_PackFrame())
            try:
                ctx = _PackSingle(f"{kvar}.v", f"{kvar}.nm")
                arms = []
                lengths = []
                for j, canon in enumerate(group.comp):
                    target, uri = self._vref_targets[canon]
                    self._v_base_uri = uri
                    triples = self._entry_triples_sql(
                        target, f"{kvar}.nm", _Views(f"{kvar}.v"),
                        ctx=ctx)
                    parts = self._violation_parts(triples, f"{kvar}.nm")
                    lengths.append(len(parts))
                    # per-TRIPLE violation slots, not just the first
                    # failing: a top-level site expands back to one
                    # rule per slot, so collect-all output matches the
                    # inline unroll exactly
                    arms.append(
                        "array(" + ", ".join(parts) + ")" if parts
                        else f"CAST(array() AS ARRAY<{VIOL_STRUCT_SQL}>)")
                if len(arms) == 1:
                    body = arms[0]
                else:
                    body = ("CASE " + " ".join(
                        f"WHEN {kvar}.c = {j} THEN {v}"
                        for j, v in enumerate(arms)) + " END")
                body = self._vpack_bind(self._vpack_frames[-1], body)
            finally:
                self._vpack_frames.pop()
                self._vref_stack = saved_stack
                self._v_base_uri = saved_base
            cached = memo[mkey] = (kvar, tuple(lengths), body)
        return cached

    def _vpack_flush(self) -> None:
        """Assemble each global group's packed result array into its
        helper column (rules already reference the fixed name).  Called
        once by the plan builders after every rule has compiled."""
        fr = getattr(self, "_vpack_global_", None)
        if fr is None or not fr.groups:
            return
        from pyspark.sql import functions as F
        for group in fr.groups.values():
            rs = self._vpack_child_sql(group)
            self.aux_cols.append((group.rsvar.strip("`"), F.expr(rs)))
        fr.groups.clear()

    def _vpack_bind(self, frame: _PackFrame, text: str) -> str:
        """Bind every packed group's result array around ``text`` (the
        composed level expression) via the array-of-one ``transform``
        trick — SQL text's only let-binding."""
        for group in reversed(list(frame.groups.values())):
            rs = self._vpack_child_sql(group)
            text = (f"try_element_at(transform(array({rs}), "
                    f"{group.rsvar} -> {text}), 1)")
        return text

    def _vpack_compile_top(self, definition, name_sql, views, ctx,
                           pass_only: bool = False):
        """Compile entry triples at a TOP-LEVEL site under the shared
        global frame: every top-level recursion site of one target
        joins the SAME group, whose result array becomes ONE helper
        column (``_vpack_flush``) that all consuming rules reference by
        its fixed name — zero per-rule, per-property duplication of the
        packed chain."""
        if not getattr(self, "pack_recursion", True):
            return self._entry_triples_sql(definition, name_sql, views,
                                           pass_only=pass_only, ctx=None)
        self._vpack_frames.append(self._vpack_global_frame())
        try:
            return self._entry_triples_sql(definition, name_sql, views,
                                           pass_only=pass_only, ctx=ctx)
        finally:
            self._vpack_frames.pop()

    # -- uniqueItems freeze canonicalization -------------------------------

    def _variant_canon_tpl(self, depth: int) -> str:
        """The reference's uniqueItems freeze canonicalization
        (draft04.py:412-421) as a canonical STRING of a VARIANT value,
        as a memoized SQL template over the ``__CANON_V__`` placeholder:
        two values render equal iff the reference's ``fn`` makes them
        equal set members —

        * bool -> ``str(var)`` ("True"/"False"), deliberately COLLIDING
          with the equal strings;
        * numbers compare cross-type (1 == 1.0): integral values render
          exact integer digits (long when BIGINT or |v| < 2^63,
          decimal(38,0) beyond, double repr past 1e38), non-integral
          ones their double repr;
        * strings are length-prefixed (collision-proof against the
          container separators);
        * dict -> frozenset => sorted key=canon entries; list -> tuple
          => ordered element canons.

        Containers nested past ``depth`` raise at evaluation time (loud,
        never a silently wrong verdict)."""
        cache = getattr(self, "_canon_tpl_cache", None)
        if cache is None:
            cache = self._canon_tpl_cache = {}
        if depth in cache:
            return cache[depth]
        w = _Views(_CANON_V)
        integral = (f"(NOT isnan({w.num}) AND abs({w.num}) != "
                    f"double('Infinity') AND ({w.num} % 1.0D) = 0.0D)")
        exact_digits = (
            "coalesce("
            f"CASE WHEN {w.sov} = 'BIGINT' THEN CAST({w.lng} AS STRING) END, "
            f"CASE WHEN abs({w.num}) < {sqlnum(float(2 ** 63))} "
            f"THEN CAST(CAST({w.num} AS BIGINT) AS STRING) END, "
            f"CAST(try_cast({w.num} AS DECIMAL(38,0)) AS STRING), "
            f"CAST({w.num} AS STRING))")
        num_canon = (f"concat('n:', CASE WHEN {_nf(integral)} "
                     f"THEN {exact_digits} "
                     f"ELSE CAST({w.num} AS STRING) END)")
        str_canon = (f"concat('s:', CAST(length({w.s}) AS STRING), ':', "
                     f"{w.s})")
        bool_canon = f"IF({w.b}, 's:4:True', 's:5:False')"
        scalar = (f"CASE WHEN {w.vnull} THEN 'z' "
                  f"WHEN {w.sov} = 'BOOLEAN' THEN {bool_canon} "
                  f"WHEN {w.sov} = 'STRING' THEN {str_canon} "
                  f"WHEN {w.is_num} THEN {num_canon} ")
        if depth <= 0:
            deep = ("CAST(raise_error('uniqueItems value nests deeper "
                    "than the canonicalization bound; raise canon_depth "
                    "or use engine=\\'python\\'') AS STRING)")
            tpl = scalar + f"ELSE {deep} END"
        else:
            x = f"__cx{depth}"
            e = f"__ce{depth}"
            inner = self._variant_canon_tpl(depth - 1)
            arr_canon = (
                f"concat('a:[', concat_ws('\\u001f', transform({w.arr}, "
                f"{x} -> {inner.replace(_CANON_V, x)})), ']')")
            entry = (f"concat('k:', CAST(length({e}.key) AS STRING), ':', "
                     f"{e}.key, '=', "
                     f"{inner.replace(_CANON_V, e + '.value')})")
            obj_canon = (
                f"concat('o:{{', concat_ws('\\u001f', array_sort("
                f"transform(map_entries({w.obj}), {e} -> {entry}))), '}}')")
            tpl = (scalar
                   + f"WHEN {w.is_arr} THEN {arr_canon} "
                   + f"WHEN {w.is_obj} THEN {obj_canon} "
                   + f"ELSE concat('?', {w.sov}) END")
        cache[depth] = tpl
        return tpl

    def _variant_canon_sql(self, v_sql: str, depth: int) -> str:
        return self._vsql_spend(
            self._variant_canon_tpl(depth).replace(_CANON_V, v_sql))

    def _variant_too_deep_tpl(self, depth: int) -> str:
        """Boolean template over ``__CANON_V__``: does the value contain
        a CONTAINER nested more than ``depth`` levels down — exactly the
        data that would hit the canon template's raise branch.  Used by
        ``on_depth_exceeded="violation"`` to flag too-deep rows as
        violations (job completes) instead of raising mid-scan."""
        cache = getattr(self, "_too_deep_tpl_cache", None)
        if cache is None:
            cache = self._too_deep_tpl_cache = {}
        if depth in cache:
            return cache[depth]
        w = _Views(_CANON_V)
        if depth <= 0:
            tpl = f"({w.is_arr} OR {w.is_obj})"
        else:
            x = f"__cd{depth}"
            inner = self._variant_too_deep_tpl(depth - 1).replace(
                _CANON_V, x)
            tpl = (f"(({w.is_arr} AND exists({w.arr}, {x} -> {inner})) "
                   f"OR ({w.is_obj} AND exists(map_values({w.obj}), "
                   f"{x} -> {inner})))")
        cache[depth] = tpl
        return tpl

    def _variant_too_deep_sql(self, v_sql: str, depth: int) -> str:
        return self._vsql_spend(
            self._variant_too_deep_tpl(depth).replace(_CANON_V, v_sql))

    # -- enum/const deep equality ------------------------------------------

    def _member_match_sql(self, w: _Views, m) -> str:
        """Type-strict deep equality of a VARIANT value against the
        compile-time enum/const member ``m`` (reference draft04.py:
        120-155 _enum_value_matches): bool is identity, numbers compare
        across int/float but never bool, dicts need the exact key set
        with recursively-matching values, lists exact length with
        element-wise matches."""
        if m is None:
            return w.vnull
        if isinstance(m, bool):
            return f"({w.sov} = 'BOOLEAN' AND {w.b} = {str(m).lower()})"
        if isinstance(m, (int, float)):
            if (isinstance(m, int) or float(m).is_integer()) \
                    and -2 ** 63 <= int(m) <= 2 ** 63 - 1:
                mi = int(m)
                # integral member: exact — BIGINT values match as longs;
                # DOUBLE values iff integral, in long range (the cast
                # would clamp, not null, on overflow), equal after cast
                dbl = (f"({w.is_num} AND NOT {w.is_bigint} "
                       f"AND ({w.num} % 1.0D) = 0.0D "
                       f"AND {w.num} >= {sqlnum(float(-2 ** 63))} "
                       f"AND {w.num} < {sqlnum(float(2 ** 63))} "
                       f"AND CAST({w.num} AS BIGINT) = {mi}L)")
                return (f"(({w.is_bigint} AND {w.lng} = {mi}L) OR {dbl})")
            return f"({w.is_num} AND {w.num} = {sqlnum(float(m))})"
        if isinstance(m, str):
            return f"({w.sov} = 'STRING' AND {w.s} = {sqlstr(m)})"
        if isinstance(m, dict):
            parts = [w.is_obj, f"size({w.obj}) = {len(m)}L"]
            for k, item in m.items():
                child = _Views(f"try_element_at({w.obj}, {sqlstr(k)})")
                parts.append(f"map_contains_key({w.obj}, {sqlstr(k)})")
                parts.append(self._member_match_sql(child, item))
            return "(" + " AND ".join(parts) + ")"
        if isinstance(m, (list, tuple)):
            parts = [w.is_arr, f"size({w.arr}) = {len(m)}L"]
            for i, item in enumerate(m):
                child = _Views(f"try_element_at({w.arr}, {i + 1})")
                parts.append(self._member_match_sql(child, item))
            return "(" + " AND ".join(parts) + ")"
        raise SchemaDefinitionError(
            f"enum/const member of unsupported type: {type(m).__name__}")

    # -- $ref depth guard ----------------------------------------------------

    def _depth_guard_triple_sql(self, name_sql: str, w: _Views,
                                pass_only: bool = False):
        """Triple guarding data that nests past ref_unroll_depth: with
        on_depth_exceeded="error" any VALUE present at the cut-off site
        raises at evaluation time (rows within the bound are untouched);
        with "violation" it emits a distinguishable violation row
        (mirroring the python engine's RecursionError sentinel).  The
        guard raises inside probes too — a combinator branch cannot
        honestly pass or fail on data the plan never unrolled."""
        if pass_only:
            message = (f"'value exceeds the columnar plan\\'s $ref "
                       f"unroll depth ({self.ref_unroll_depth}); raise "
                       "ref_unroll_depth or use engine=\\'python\\''")
        else:
            message = (f"concat({name_sql}, ' exceeds the columnar "
                       f"plan\\'s $ref unroll depth "
                       f"({self.ref_unroll_depth}); raise "
                       "ref_unroll_depth or use engine=\\'python\\'')")
        if self.on_depth_exceeded == "violation":
            return ("$ref-depth", message, w.present)
        err = f"raise_error({message})"
        return (None, message,
                f"CASE WHEN {w.present} THEN ({err} IS NOT NULL) "
                "ELSE false END")

    # -- violation struct ----------------------------------------------------

    def _violation_parts(self, triples, name_sql: str) -> list:
        """Per-triple violation structs (NULL when that triple passes),
        in keyword order."""
        parts = []
        for rule_id, message, fail in triples:
            if isinstance(rule_id, _NestedSQL):
                # the struct itself is NULL when the child has no
                # violation, so coalesce falls through — no separate
                # struct-non-null test needed
                parts.append(f"CASE WHEN {_nf(rule_id.gate_sql)} "
                             f"THEN {rule_id.struct_sql} END")
            else:
                rid = sqlstr(rule_id) if rule_id is not None \
                    else "CAST(NULL AS STRING)"
                parts.append(f"CASE WHEN {_nf(fail)} THEN named_struct("
                             f"'name', {name_sql}, 'rule', {rid}, "
                             f"'message', {message}) END")
        return parts

    def _violation_sql(self, triples, name_sql: str) -> str:
        """First failing triple as a violation struct (NULL when none) —
        a flat coalesce of per-triple CASEs, so every struct (and every
        nested child's struct) is written exactly once."""
        parts = self._violation_parts(triples, name_sql)
        if not parts:
            return f"CAST(NULL AS {VIOL_STRUCT_SQL})"
        if len(parts) == 1:
            return parts[0]
        return "coalesce(" + ", ".join(parts) + ")"

    def _branch_pass_sql(self, sub, name_sql, w: _Views,
                         ctx=None) -> str:
        """True where a subschema accepts the VARIANT value — no triple
        of the branch fails.  Compiles in pass-only mode: probes never
        surface names/messages/structs, so none are generated."""
        triples = self._entry_triples_sql(sub, name_sql, w,
                                          pass_only=True, ctx=ctx)
        if not triples:
            return "true"
        return ("(" + " AND ".join(f"NOT {_nf(fail)}"
                                   for _, _, fail in triples) + ")")

    # -- the keyword table ---------------------------------------------------

    def _entry_triples_sql(self, definition, name_sql: str, w: _Views,
                           pass_only: bool = False, ctx=None):
        """(rule_id, message_sql, fail_sql) triples validating one
        VARIANT value against a scalar-subset schema, in dialect keyword
        order with reference-parity messages.

        ``pass_only``: the caller is a combinator probe that consumes
        only the fail booleans — names, messages and nested violation
        structs are skipped (they would be discarded anyway, and on
        recursion-unrolled schemas they dominate plan size).

        ``ctx``: the value's position relative to its recursion-level
        root (``_PackCtx``), threading the packed-recursion machinery —
        ``None`` disables packing for this subtree (sites fall back to
        the inline unroll)."""
        if definition is True or definition == {}:
            return []
        if definition is False:
            return [(None, "NULL" if pass_only else
                     f"concat({name_sql}, ' must not be there')",
                     "true")]
        if not isinstance(definition, dict):
            raise SchemaDefinitionError("definition must be an object")
        if "$ref" in definition:
            # $ref overrides siblings (draft 04-07, like compile_value).
            # Recursion unrolls to ref_unroll_depth repeats of the SAME
            # canonical ref along this path (the reference compiles
            # recursion to recursive FUNCTIONS, generator.py:192-217;
            # expression trees must unroll); deeper DATA hits the depth
            # guard.
            base = self._v_base_uri or self.store.root_uri()
            target, doc_uri, canonical = self.store.resolve(
                definition["$ref"], base)
            if self._vref_stack.count(canonical) >= self.ref_unroll_depth:
                return [self._depth_guard_triple_sql(
                    name_sql, w, pass_only=pass_only)]
            if (getattr(self, "pack_recursion", True) and ctx is not None
                    and self._vpack_frames
                    and self._vref_component(canonical, target, doc_uri)):
                # PACKED recursion: a re-encountered ref becomes a site
                # in the level frame instead of re-inlining its body —
                # text linear in depth instead of exponential in the
                # per-level site count (SCALE.md jsoncol section)
                return self._vpack_register(canonical, target, doc_uri,
                                            ctx, w, pass_only)
            self._vref_budget -= 1
            if self._vref_budget < 0:
                self._plan_too_large(
                    "recursive $ref unrolling exceeds the expansion "
                    "budget (ref_unroll_budget); lower ref_unroll_depth "
                    "or use engine='python'")
            self._vref_stack.append(canonical)
            saved = self._v_base_uri
            self._v_base_uri = doc_uri
            try:
                expanded = self._entry_triples_sql(target, name_sql, w,
                                                   pass_only=pass_only,
                                                   ctx=ctx)
            finally:
                self._v_base_uri = saved
                self._vref_stack.pop()
            # account each expansion's text against the size budget —
            # recursion blowup shows up here, where it is created
            for _, _, fail in expanded:
                self._vsql_spend(fail)
            return expanded
        hard = [k for k in definition if k not in self._VARIANT_SUPPORTED
                and k not in self._VARIANT_ANNOTATIONS]
        if hard:
            self._plan_unsupported(
                f"open-key value schema uses {sorted(hard)} — only scalar "
                "keywords are expressible over dynamically-typed "
                "undeclared keys; use engine='python'")

        out = []

        def msg(text):
            if pass_only:
                return "NULL"
            return f"concat({name_sql}, {sqlstr(' ' + text)})"

        def any_fail(triples):
            return ("(" + " OR ".join(_nf(f) for _, _, f in triples)
                    + ")")

        def nested_value(sub, child_name_sql, child_w, gate_sql,
                         child_ctx=None):
            """One triple whose violation struct is the child value's
            own first-failing rule (pass-only probes reduce to the bare
            boolean — no struct, no messages).

            The child value expression is BOUND to a lambda variable
            (``transform(array(v), var -> ...)``) so its text appears
            once instead of once per view per rule — the rule set
            references the short variable.  Keeps nested plan size
            linear instead of multiplicative in the value-path length."""
            var = self._vsql_var("v")
            triples = self._entry_triples_sql(sub, child_name_sql,
                                              _Views(var),
                                              pass_only=pass_only,
                                              ctx=child_ctx)
            if not triples:
                return
            if pass_only:
                bound = (f"exists(array({child_w.v}), "
                         f"{var} -> {any_fail(triples)})")
                out.append((None, "NULL",
                            f"({_nf(gate_sql)} AND {bound})"))
                return
            viol = self._violation_sql(triples, child_name_sql)
            struct = (f"try_element_at(transform(array({child_w.v}), "
                      f"{var} -> {viol}), 1)")
            out.append((_NestedSQL(struct, gate_sql),
                        "CAST(NULL AS STRING)",
                        f"({_nf(gate_sql)} AND ({struct}) IS NOT NULL)"))

        def elems_ctx(start, inner_i):
            """Pack ctx for an array-elements hop — only from a Single
            parent (one collection hop per level, see _PackCtx)."""
            if not isinstance(ctx, _PackSingle):
                return None
            lv = _Views(ctx.val)
            sx, si = self._vsql_var(), self._vsql_var("i")
            coll = (f"slice({lv.arr}, {start + 1}, "
                    f"greatest(size({lv.arr}) - {start}, 0))")
            cname = (f"concat({ctx.name}, '[', CAST({si} + {start} "
                     f"AS STRING), ']')")
            return _PackArray(coll, sx, si, sx, cname, inner_i)

        def first_failing_elems(sub, start):
            """First array element from ``start`` violating the element
            schema (name ``data...[i]``)."""
            x, i, y = self._vsql_var(), self._vsql_var("i"), \
                self._vsql_var("y")
            tail = (f"slice({w.arr}, {start + 1}, "
                    f"greatest(size({w.arr}) - {start}, 0))")
            if pass_only:
                # (x, i) transform instead of a bare exists: packed
                # sites inside the element schema correlate by index
                triples = self._entry_triples_sql(
                    sub, "NULL", _Views(x), pass_only=True,
                    ctx=elems_ctx(start, i))
                if not triples:
                    return
                bools = (f"transform({tail}, ({x}, {i}) -> "
                         f"{any_fail(triples)})")
                out.append((None, "NULL",
                            f"({w.is_arr} AND {_nf(f'exists({bools}, {y} -> {y})')})"))
                return
            ename = f"concat({name_sql}, '[', CAST({i} + {start} " \
                    f"AS STRING), ']')"
            triples = self._entry_triples_sql(sub, ename, _Views(x),
                                              ctx=elems_ctx(start, i))
            if not triples:
                return
            viol = self._violation_sql(triples, ename)
            failing = (f"filter(transform({tail}, ({x}, {i}) -> {viol}), "
                       f"{y} -> {y} IS NOT NULL)")
            out.append((
                _NestedSQL(f"try_element_at({failing}, 1)", w.is_arr),
                "CAST(NULL AS STRING)",
                f"({w.is_arr} AND {_nf(f'size({failing}) > 0')})"))

        def entries_ctx(key_filter, inner_e):
            """Pack ctx for an object-entries hop — only from a Single
            parent; the segment applies the SAME key filter so packed
            evaluation never touches an entry the inline form would
            have skipped."""
            if not isinstance(ctx, _PackSingle):
                return None
            lv = _Views(ctx.val)
            se = self._vsql_var("e")
            return _PackEntries(
                f"map_entries({lv.obj})", se, key_filter(f"{se}.key"),
                f"{se}.value", f"concat({ctx.name}, '.', {se}.key)",
                f"{inner_e}.key")

        def first_failing_entry(key_filter, sub, rule_label):
            """First (key, value) entry passing ``key_filter`` whose
            value violates ``sub`` (name ``data...key``)."""
            e, y = self._vsql_var("e"), self._vsql_var("y")
            if pass_only:
                triples = self._entry_triples_sql(
                    sub, "NULL", _Views(f"{e}.value"), pass_only=True,
                    ctx=entries_ctx(key_filter, e))
                if not triples:
                    return
                pred = (f"({key_filter(e + '.key')} "
                        f"AND {any_fail(triples)})")
                out.append((None, "NULL",
                            f"({w.is_obj} AND {_nf(f'exists(map_entries({w.obj}), {e} -> {pred})')})"))
                return
            ename = f"concat({name_sql}, '.', {e}.key)"
            triples = self._entry_triples_sql(sub, ename,
                                              _Views(f"{e}.value"),
                                              ctx=entries_ctx(key_filter,
                                                              e))
            if not triples:
                return
            viol = self._violation_sql(triples, ename)
            entry = (f"CASE WHEN {key_filter(e + '.key')} "
                     f"THEN {viol} END")
            failing = (f"filter(transform(map_entries({w.obj}), "
                       f"{e} -> {entry}), {y} -> {y} IS NOT NULL)")
            out.append((
                _NestedSQL(f"try_element_at({failing}, 1)", w.is_obj),
                "CAST(NULL AS STRING)",
                f"({w.is_obj} AND {_nf(f'size({failing}) > 0')})"))

        def type_pass(t):
            if t == "null":
                return w.vnull
            if t == "boolean":
                return f"({w.sov} = 'BOOLEAN')"
            if t == "string":
                return w.is_str
            if t == "integer":
                if self.integral_float_is_int:
                    # modulo, not floor(): floor(double) -> LONG
                    # overflows past 2^63 (1e308 is integral)
                    return (f"({w.is_num} AND ({w.num} % 1.0D) = 0.0D)")
                # draft-04 strict: json.loads("3.0") is a FLOAT, never an
                # int — but the variant parser canonicalizes "3.0" to
                # DECIMAL(1,0), erasing the distinction.  A DECIMAL(p,0)
                # tag can only come from (a) a decimal-point/exponent
                # literal, or (b) a plain integer too big for BIGINT
                # (>= 2^63, p >= 19) — so scale-0 decimals count as
                # integers only past the long range.  Documented corner:
                # a >=2^63 integral written WITH a decimal point
                # ("9.3e18" style) is indistinguishable and passes.
                return (f"({w.sov} = 'BIGINT' OR "
                        f"(startswith({w.sov}, 'DECIMAL') AND "
                        f"{w.sov} RLIKE ',0\\\\)$' AND "
                        f"abs({w.num}) >= 9.223372036854776E18D))")
            if t == "number":
                return w.is_num
            if t == "array":
                return w.is_arr
            if t == "object":
                return w.is_obj
            raise SchemaDefinitionError("Unknown type")

        def regex_fail(pattern, anchored):
            """is_str & ~match — PlanUnsupported under the python regex
            engine (a pandas UDF cannot live inside HOF lambdas; the
            python engine is the exact-parity path)."""
            if self.regex_engine == "python":
                self._plan_unsupported(
                    "python-regex parity over variant values; use "
                    "engine='python'")
            java = jvm_pattern(pattern)
            if anchored and not java.startswith("^"):
                java = "^(?:" + java + ")"
            match = f"rlike({w.s}, {sqlstr(java)})"
            return f"({w.is_str} AND NOT {_nf(match)})"

        _BOUND_OPS = {
            # fail-op, integer-edge transform (for an integer value v:
            # v < b <=> v < ceil(b); v <= b <=> v <= floor(b);
            # v > b <=> v > floor(b); v >= b <=> v >= ceil(b))
            "lt": ("<", math.ceil),
            "le": ("<=", math.floor),
            "gt": (">", math.floor),
            "ge": (">=", math.ceil),
        }

        def bound(keyword, kind, template):
            b = definition[keyword]
            from decimal import Decimal
            if not isinstance(b, (int, float, Decimal)):
                raise SchemaDefinitionError(f"{keyword} must be a number")
            op, edge = _BOUND_OPS[kind]
            # compare the literal the reference's generated source
            # re-parses (ref_numeric); the message keeps str(b)
            b_msg, b = b, ref_numeric(b)
            lit_b = sqlnum(int(b) if isinstance(b, bool) else b)
            dbl_fail = (f"({w.is_numlike} AND NOT {w.is_bigint} "
                        f"AND NOT {w.is_intdec} AND {w.num} {op} {lit_b})")
            # exact long-side comparison for BIGINT values — the double
            # view rounds 2^53+ magnitudes across the bound
            try:
                bi = int(edge(b))
            except (OverflowError, ValueError):  # infinite bound
                bi = None
            # the "every value sits on one side" constant for bounds
            # outside a value class's range
            high = b > 0
            const = str(high if kind in ("lt", "le") else not high).lower()
            if bi is not None and -2 ** 63 <= bi <= 2 ** 63 - 1:
                big_fail = f"({w.is_bigint} AND {w.lng} {op} {bi}L)"
            else:
                big_fail = f"({w.is_bigint} AND {const})"
            # exact comparison for JSON integers BEYOND long range too
            # (variant tag DECIMAL(p,0)): the double view rounds across
            # the bound exactly as it does for 2^53..2^63 longs
            dv = f"try_variant_get({w.v}, '$', 'decimal(38,0)')"
            if bi is not None and len(str(abs(bi))) <= 38:
                dec_fail = (f"({w.is_intdec} AND {dv} {op} "
                            f"CAST('{bi}' AS DECIMAL(38,0)))")
            else:
                dec_fail = f"({w.is_intdec} AND {const})"
            return (keyword, msg(template.format(b_msg)),
                    f"({dbl_fail} OR {big_fail} OR {dec_fail})")

        for keyword in self.keyword_order:
            if keyword not in definition:
                continue
            if keyword == "type":
                declared = definition["type"]
                types = declared if isinstance(declared, list) \
                    else [declared]
                for t in types:
                    if t not in ("null", "boolean", "number", "integer",
                                 "string", "array", "object"):
                        raise SchemaDefinitionError("Unknown type")
                ok = " OR ".join(type_pass(t) for t in types)
                out.append(("type", msg("must be " + " or ".join(types)),
                            f"NOT ({ok})"))
            elif keyword == "enum":
                enum = definition["enum"]
                if not isinstance(enum, (list, tuple)):
                    raise SchemaDefinitionError("enum must be an array")
                ok = " OR ".join(self._member_match_sql(w, m)
                                 for m in enum) or "false"
                out.append(("enum",
                            msg(f"must be one of {schema_value_repr(enum)}"),
                            f"NOT ({ok})"))
            elif keyword == "const":
                const = definition["const"]
                out.append(("const",
                            msg("must be same as const definition: "
                                f"{schema_value_repr(const)}"),
                            f"NOT ({self._member_match_sql(w, const)})"))
            elif keyword == "minimum":
                # exclusiveMinimum as the draft-04 truthy modifier
                # (reference draft04.py:339, inherited by later dialects)
                if bool(definition.get("exclusiveMinimum", False)):
                    out.append(bound("minimum", "le",
                                     "must be bigger than {}"))
                else:
                    out.append(bound("minimum", "lt",
                                     "must be bigger than or equal to {}"))
            elif keyword == "maximum":
                if bool(definition.get("exclusiveMaximum", False)):
                    out.append(bound("maximum", "ge",
                                     "must be smaller than {}"))
                else:
                    out.append(bound("maximum", "gt",
                                     "must be smaller than or equal "
                                     "to {}"))
            elif keyword == "exclusiveMinimum":
                out.append(bound("exclusiveMinimum", "le",
                                 "must be bigger than {}"))
            elif keyword == "exclusiveMaximum":
                out.append(bound("exclusiveMaximum", "ge",
                                 "must be smaller than {}"))
            elif keyword == "multipleOf":
                from decimal import Decimal
                divisor = definition["multipleOf"]
                if not isinstance(divisor, (int, float, Decimal)):
                    raise SchemaDefinitionError(
                        "multipleOf must be a number")
                # Decimal divisors compare as the reference's re-parsed
                # source literal; the message keeps str(original)
                msg_divisor, divisor = divisor, ref_numeric(divisor)
                # deliberately the DOUBLE view for every numeric variant,
                # including BIGINT, mirroring the reference exactly:
                # - int divisor: q = value / divisor via float TRUE
                #   DIVISION, invalid iff q is non-integral (any
                #   |q| >= 2^52 is integral and VALID, draft04.py:366)
                # - float divisor: Decimal(repr(value)) path -> decimal
                #   cast (try_cast + double-fmod fallback)
                if isinstance(divisor, (int, bool)) \
                        and not isinstance(divisor, float):
                    q = f"({w.num} / {sqlnum(float(divisor))})"
                    fail = f"({w.is_numlike} AND ({q} % 1.0D) != 0.0D)"
                else:
                    dec = "DECIMAL(38,18)"
                    div = divisor if isinstance(divisor, Decimal) \
                        else repr(float(divisor))
                    fail = (f"({w.is_numlike} AND coalesce("
                            f"(try_cast({w.num} AS {dec}) % "
                            f"CAST('{div}' AS {dec})) != CAST(0 AS {dec}), "
                            f"({w.num} % {sqlnum(float(divisor))}) "
                            "!= 0.0D))")
                out.append(("multipleOf",
                            msg(f"must be multiple of {msg_divisor}"),
                            fail))
                out.append(("multipleOf", "'inifinity reached'",
                            f"({w.is_numlike} AND ({w.num} / "
                            f"{sqlnum(float(divisor))}) = "
                            "double('Infinity'))"))
            elif keyword == "minLength":
                b = definition["minLength"]
                out.append(("minLength",
                            msg(f"must be longer than or equal to {b} "
                                "characters"),
                            f"({w.is_str} AND length({w.s}) "
                            f"< {sqlnum(b)})"))
            elif keyword == "maxLength":
                b = definition["maxLength"]
                out.append(("maxLength",
                            msg(f"must be shorter than or equal to {b} "
                                "characters"),
                            f"({w.is_str} AND length({w.s}) "
                            f"> {sqlnum(b)})"))
            elif keyword == "pattern":
                pattern = definition["pattern"]
                fixed = _UNESCAPED_DOLLAR.sub(r"\\Z", pattern)
                out.append(("pattern",
                            msg(f"must match pattern {pattern}"),
                            regex_fail(fixed, anchored=False)))
            elif keyword == "format":
                if not self.use_formats:
                    continue
                fmt = definition["format"]
                regex = None
                if fmt in self.custom_formats and \
                        isinstance(self.custom_formats[fmt], str):
                    regex = self.custom_formats[fmt]
                elif fmt in self.custom_formats:
                    self._plan_unsupported(
                        f"callable custom format {fmt!r} over undeclared "
                        "keys; use engine='python'")
                elif fmt in self.format_table:
                    regex = self.format_table[fmt]
                if regex is not None:
                    out.append(("format", msg(f"must be {fmt}"),
                                regex_fail(regex, anchored=True)))
            elif keyword == "allOf":
                # reference inlines allOf sub-blocks: inner keywords
                # surface with their own rules/messages (draft04.py:173)
                subs = definition["allOf"]
                if not isinstance(subs, (list, tuple)):
                    raise SchemaDefinitionError("allOf must be an array")
                for sub in subs:
                    out.extend(self._entry_triples_sql(
                        sub, name_sql, w, pass_only=pass_only, ctx=ctx))
            elif keyword == "anyOf":
                subs = definition["anyOf"]
                if not isinstance(subs, (list, tuple)):
                    raise SchemaDefinitionError("anyOf must be an array")
                any_pass = " OR ".join(
                    self._branch_pass_sql(sub, name_sql, w, ctx=ctx)
                    for sub in subs) or "false"
                out.append(("anyOf",
                            msg("cannot be validated by any definition"),
                            f"NOT ({any_pass})"))
            elif keyword == "oneOf":
                subs = definition["oneOf"]
                if not isinstance(subs, (list, tuple)):
                    raise SchemaDefinitionError("oneOf must be an array")
                count = " + ".join(
                    f"CAST({self._branch_pass_sql(sub, name_sql, w, ctx=ctx)} "
                    "AS INT)" for sub in subs) or "0"
                out.append(("oneOf",
                            "NULL" if pass_only else
                            f"concat({name_sql}, ' must be valid exactly "
                            f"by one definition (', CAST(({count}) AS "
                            "STRING), ' matches found)')",
                            f"({count}) != 1"))
            elif keyword == "not":
                sub = definition["not"]
                if sub is True:
                    out.append(("not", msg("must not be there"), "true"))
                elif sub is False:
                    pass
                elif isinstance(sub, dict) and not sub:
                    out.append(("not",
                                msg("must NOT match a disallowed "
                                    "definition"),
                                "true"))
                else:
                    out.append(("not",
                                msg("must NOT match a disallowed "
                                    "definition"),
                                self._branch_pass_sql(sub, name_sql, w,
                                                      ctx=ctx)))
            elif keyword == "if":
                if_pass = _nf(self._branch_pass_sql(
                    definition["if"], name_sql, w, ctx=ctx))
                for rid, message, fail in self._entry_triples_sql(
                        definition.get("then", True), name_sql, w,
                        pass_only=pass_only, ctx=ctx):
                    out.append((rid, message, f"({if_pass} AND {fail})"))
                for rid, message, fail in self._entry_triples_sql(
                        definition.get("else", True), name_sql, w,
                        pass_only=pass_only, ctx=ctx):
                    out.append((rid, message,
                                f"(NOT {if_pass} AND {fail})"))
            elif keyword == "minItems":
                b = definition["minItems"]
                if not isinstance(b, (int, float)):
                    raise SchemaDefinitionError("minItems must be a number")
                out.append(("minItems",
                            msg(f"must contain at least {b} items"),
                            f"({w.is_arr} AND size({w.arr}) "
                            f"< {sqlnum(b)})"))
            elif keyword == "maxItems":
                b = definition["maxItems"]
                if not isinstance(b, (int, float)):
                    raise SchemaDefinitionError("maxItems must be a number")
                out.append(("maxItems",
                            msg(f"must contain less than or equal to {b} "
                                "items"),
                            f"({w.is_arr} AND size({w.arr}) "
                            f"> {sqlnum(b)})"))
            elif keyword == "uniqueItems":
                if definition["uniqueItems"]:
                    x = self._vsql_var()
                    canon = self._variant_canon_sql(x, self.canon_depth)
                    canons = f"transform({w.arr}, {x} -> {canon})"
                    dup = (f"({w.is_arr} AND size({w.arr}) > "
                           f"size(array_distinct({canons})))")
                    if self.on_depth_exceeded == "violation":
                        # scale mode: a too-deep element becomes ONE
                        # violation row and the canon (whose depth-0
                        # branch raises) is skipped via a lazy CASE —
                        # never an aborted job, never a silent verdict
                        xd = self._vsql_var()
                        probe = self._variant_too_deep_sql(
                            xd, self.canon_depth)
                        too_deep = (f"({w.is_arr} AND exists({w.arr}, "
                                    f"{xd} -> {probe}))")
                        out.append((
                            "uniqueItems-depth",
                            msg("nests deeper than the uniqueItems "
                                "canonicalization depth (canon_depth="
                                f"{self.canon_depth}); raise canon_depth "
                                "for an exact verdict"),
                            too_deep))
                        dup = (f"(CASE WHEN {too_deep} THEN false "
                               f"ELSE {dup} END)")
                    out.append((
                        "uniqueItems", msg("must contain unique items"),
                        dup))
            elif keyword == "items":
                items_definition = definition["items"]
                if items_definition is False:
                    out.append(("items", msg("must not be there"),
                                f"({w.is_arr} AND size({w.arr}) > 0)"))
                elif isinstance(items_definition, list):
                    for idx, idef in enumerate(items_definition):
                        nested_value(
                            idef, f"concat({name_sql}, '[{idx}]')",
                            _Views(f"try_element_at({w.arr}, {idx + 1})"),
                            f"({w.is_arr} AND size({w.arr}) > {idx})",
                            child_ctx=_derive_ctx(
                                ctx,
                                lambda lv, _n=idx: (
                                    f"try_element_at({lv.arr}, {_n + 1})"),
                                lambda nm, _n=idx: (
                                    f"concat({nm}, '[{_n}]')")))
                    n_fixed = len(items_definition)
                    extra = definition.get("additionalItems")
                    if extra is False:
                        out.append(("items",
                                    msg("must contain only specified "
                                        "items"),
                                    f"({w.is_arr} AND size({w.arr}) "
                                    f"> {n_fixed})"))
                    elif isinstance(extra, (dict, bool)) \
                            and extra is not True:
                        first_failing_elems(extra, start=n_fixed)
                elif items_definition is not True:
                    first_failing_elems(items_definition, start=0)
            elif keyword == "contains":
                cd = definition["contains"]
                if cd is False:
                    out.append(("contains", msg("is always invalid"),
                                w.is_arr))
                elif cd is True:
                    out.append(("contains", msg("must not be empty"),
                                f"({w.is_arr} AND size({w.arr}) = 0)"))
                else:
                    x = self._vsql_var()
                    elem_pass = self._branch_pass_sql(cd, name_sql,
                                                      _Views(x))
                    out.append(("contains",
                                msg("must contain one of contains "
                                    "definition"),
                                f"({w.is_arr} AND NOT exists({w.arr}, "
                                f"{x} -> {elem_pass}))"))
            elif keyword == "minProperties":
                b = definition["minProperties"]
                if not isinstance(b, (int, float)):
                    raise SchemaDefinitionError(
                        "minProperties must be a number")
                out.append(("minProperties",
                            msg(f"must contain at least {b} properties"),
                            f"({w.is_obj} AND size({w.okeys}) "
                            f"< {sqlnum(b)})"))
            elif keyword == "maxProperties":
                b = definition["maxProperties"]
                if not isinstance(b, (int, float)):
                    raise SchemaDefinitionError(
                        "maxProperties must be a number")
                out.append(("maxProperties",
                            msg(f"must contain less than or equal to {b} "
                                "properties"),
                            f"({w.is_obj} AND size({w.okeys}) "
                            f"> {sqlnum(b)})"))
            elif keyword == "required":
                required = definition["required"]
                if not isinstance(required, (list, tuple)):
                    raise SchemaDefinitionError("required must be an array")
                if len(required) != len(set(required)):
                    raise SchemaDefinitionError(
                        "required must contain unique elements")
                if not definition.get("additionalProperties", True):
                    patterns = list(definition.get("patternProperties",
                                                   {}))
                    impossible = [
                        key for key in required
                        if key not in definition.get("properties", {})
                        and not any(re.search(p, key) for p in patterns)
                    ]
                    if impossible:
                        raise SchemaDefinitionError(
                            "data: items {} are required but not allowed"
                            .format(impossible))
                flags = [
                    (key, f"NOT {_nf(f'map_contains_key({w.obj}, {sqlstr(key)})')}")
                    for key in required
                ]
                any_missing = " OR ".join(f for _, f in flags) or "false"
                # message lists ONLY the missing keys, sorted
                # (draft04.py:525-528)
                quoted = ", ".join(
                    f"CASE WHEN {flag} THEN {sqlstr(chr(39) + key + chr(39))} END"
                    for key, flag in flags)
                y = self._vsql_var("y")
                out.append(("required",
                            "NULL" if pass_only else
                            f"concat({name_sql}, ' must contain [', "
                            f"concat_ws(', ', array_sort(filter(array("
                            f"{quoted}), {y} -> {y} IS NOT NULL))), "
                            "'] properties')",
                            f"({w.is_obj} AND ({any_missing}))"))
            elif keyword == "properties":
                for key, sub in definition["properties"].items():
                    if not isinstance(sub, (dict, bool)):
                        clean = re.sub(r"[^a-zA-Z0-9]", "", key)
                        raise SchemaDefinitionError(
                            "data[{}] must be object".format(clean))
                    nested_value(
                        sub, f"concat({name_sql}, {sqlstr('.' + key)})",
                        _Views(f"try_element_at({w.obj}, {sqlstr(key)})"),
                        f"({w.is_obj} AND "
                        f"{_nf(f'map_contains_key({w.obj}, {sqlstr(key)})')})",
                        child_ctx=_derive_ctx(
                            ctx,
                            lambda lv, _k=key: (
                                f"try_element_at({lv.obj}, {sqlstr(_k)})"),
                            lambda nm, _k=key: (
                                f"concat({nm}, {sqlstr('.' + _k)})")))
            elif keyword == "dependencies":
                deps = definition["dependencies"]
                if not isinstance(deps, dict):
                    raise SchemaDefinitionError(
                        "dependencies must be an object")
                for key, req in deps.items():
                    present = (f"({w.is_obj} AND "
                               f"{_nf(f'map_contains_key({w.obj}, {sqlstr(key)})')})")
                    if req == [] or req is True:
                        continue
                    if req is False:
                        out.append(("dependencies",
                                    f"concat({sqlstr(key + ' in ')}, "
                                    f"{name_sql}, ' must not be there')",
                                    present))
                    elif isinstance(req, (list, tuple)):
                        for needed in req:
                            out.append((
                                "dependencies",
                                f"concat({name_sql}, "
                                f"{sqlstr(f' missing dependency {needed} for {key}')})",
                                f"({present} AND NOT "
                                f"{_nf(f'map_contains_key({w.obj}, {sqlstr(needed)})')})"))
                    else:
                        for rid, message, fail in \
                                self._entry_triples_sql(
                                    req, name_sql, w,
                                    pass_only=pass_only, ctx=ctx):
                            out.append((rid, message,
                                        f"({present} AND {_nf(fail)})"))
            elif keyword == "additionalProperties":
                add_def = definition["additionalProperties"]
                if add_def is True or add_def == {}:
                    continue
                declared = list(definition.get("properties", {}))
                java_patterns = [
                    jvm_pattern(_UNESCAPED_DOLLAR.sub(r"\\Z", p))
                    for p in definition.get("patternProperties", {})
                ]

                def is_extra(k_sql):
                    conds = ["true"]
                    for key in declared:
                        conds.append(f"{k_sql} != {sqlstr(key)}")
                    for j in java_patterns:
                        conds.append(f"NOT rlike({k_sql}, {sqlstr(j)})")
                    return "(" + " AND ".join(conds) + ")"

                if add_def is False:
                    k = self._vsql_var("k")
                    extras = f"filter({w.okeys}, {k} -> {is_extra(k)})"
                    if pass_only:
                        out.append(("additionalProperties", "NULL",
                                    f"({w.is_obj} AND "
                                    f"{_nf(f'size({extras}) > 0')})"))
                        continue
                    shown = (f"concat('{{', concat_ws(', ', transform("
                             f"array_sort({extras}), {k} -> concat("
                             f"\"'\", {k}, \"'\"))), '}}')")
                    out.append(("additionalProperties",
                                f"concat({name_sql}, ' must not contain ', "
                                f"{shown}, ' properties')",
                                f"({w.is_obj} AND "
                                f"{_nf(f'size({extras}) > 0')})"))
                else:
                    first_failing_entry(is_extra, add_def,
                                        "additionalProperties")
            elif keyword == "patternProperties":
                for pattern, sub in definition["patternProperties"].items():
                    if sub is True or sub == {}:
                        continue
                    java = jvm_pattern(
                        _UNESCAPED_DOLLAR.sub(r"\\Z", pattern))

                    def matcher(k_sql, _j=java):
                        return f"rlike({k_sql}, {sqlstr(_j)})"

                    if sub is False:
                        k = self._vsql_var("k")
                        matching = (f"filter({w.okeys}, {k} -> "
                                    f"{matcher(k)})")
                        fail = (f"({w.is_obj} AND "
                                f"{_nf(f'size({matching}) > 0')})")
                        if pass_only:
                            out.append((None, "NULL", fail))
                            continue
                        first_k = (f"try_element_at(array_sort("
                                   f"{matching}), 1)")
                        kname = f"concat({name_sql}, '.', {first_k})"
                        # gate = the FULL fail condition: this struct is
                        # non-null even with zero matches (named_struct
                        # of a NULL name), unlike the first-failing and
                        # nested-value structs
                        out.append((_NestedSQL(
                            f"named_struct('name', {kname}, 'rule', "
                            f"CAST(NULL AS STRING), 'message', "
                            f"concat({kname}, ' must not be there'))",
                            fail),
                            "CAST(NULL AS STRING)",
                            fail))
                    else:
                        first_failing_entry(matcher, sub,
                                            "patternProperties")
            elif keyword == "contentEncoding":
                if definition["contentEncoding"] == "base64":
                    # the reference runs base64.b64decode WITHOUT
                    # validate: non-alphabet chars are DISCARDED, then
                    # the filtered length must pad to a multiple of 4 —
                    # Spark's try_to_binary alone is laxer (accepts
                    # 'abc'), so mirror the filter + padding check
                    filt = (f"regexp_replace({w.s}, "
                            "'[^A-Za-z0-9+/=]', '')")
                    out.append((
                        None, msg("must be encoded by base64"),
                        f"({w.is_str} AND ((length({filt}) % 4L) != 0L "
                        f"OR try_to_binary({filt}, 'base64') IS NULL))"))
            elif keyword == "contentMediaType":
                if definition["contentMediaType"] == "application/json":
                    lit_ok = (f"rlike({w.s}, {sqlstr(_JSON_LITERAL_RE)})")
                    out.append((
                        None, msg("must be valid JSON"),
                        f"({w.is_str} AND get_json_object({w.s}, '$') "
                        f"IS NULL AND NOT {lit_ok})"))
            elif keyword == "propertyNames":
                nd = definition["propertyNames"]
                if nd is True or nd == {}:
                    continue
                if nd is False:
                    out.append(("propertyNames", msg("must not be there"),
                                f"({w.is_obj} AND size({w.okeys}) > 0)"))
                else:
                    # keys are KNOWN strings: str_mode views freeze the
                    # type tag to 'STRING' so non-string branches fold
                    k = self._vsql_var("k")
                    name_pass = self._branch_pass_sql(
                        nd, "''", _Views(k, str_mode=True))
                    out.append(("propertyNames",
                                msg("must be named by propertyName "
                                    "definition"),
                                f"({w.is_obj} AND NOT "
                                f"{_nf(f'forall({w.okeys}, {k} -> {name_pass})')})"))
        return out
