#!/usr/bin/env python
"""Stale-evidence guard (VERDICT r5 item #1).

"Green on latest driver check" is only true while the code a CORRECTNESS row
tested is the code at HEAD.  Round 5 shipped with 7 queries (st9-st14, l60)
whose implementation changed AFTER their last driver sweep — the board read
green on evidence that no longer described the code.  This tool makes that
state mechanically visible:

    for every registered query
        sweep_ct  = commit time of CORRECTNESS_r{N}.json for the LATEST
                    round N that recorded the query (the driver commits the
                    file at the next round's start, before any builder
                    commit, so this upper-bounds the sweep time)
        change_ct = latest git commit touching the query's OWN top-level
                    span (decorator + def, so the oracle SQL counts), OR
                    any package top-level span it transitively references
                    (helpers in its module, operators/io/_util functions
                    reached through imports) — uncommitted edits count as
                    "now"
        stale     = change_ct > sweep_ct (or never swept at all)

Span change times come from ``git log -L start,end:file`` against HEAD and
are cached per (blob-sha, span) in ``tools/.stale_cache.json`` so repeat
runs only pay for files that actually changed.  Reference resolution is an
over-approximation on purpose: an attribute name that matches a top-level
def in any package module links to all of them — the guard may flag too
much, never too little (modulo dynamic dispatch, which this codebase's
query layer doesn't use).

CLI:  python tools/stale_evidence.py        # report, exit 1 if stale
Test: tests/test_invariants.py::test_stale_evidence_queries_lead_the_sweep
      asserts every stale query is matched by a SWEEP_HEAD prefix, i.e.
      will be at the front of the next driver sweep.
"""

from __future__ import annotations

import ast
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "google_analytics_dataframes_spark"
CACHE_PATH = os.path.join(REPO, "tools", ".stale_cache.json")
UNCOMMITTED = float("inf")

# Ubiquitous infrastructure is EXCLUDED from reference propagation: every
# query goes through load_table/session/registry/dsum, so a change there is
# exercised — and revalidated — by ANY sweep's ~50 queries the very next
# round.  Propagating their change times would flag the entire registry
# (measured: io.py's round-5 TIMESTAMP_NTZ fix alone flagged 77 queries),
# which a budgeted sweep cannot act on.  Family-specific helpers (streaming
# staging, dedup operators, ...) DO propagate — they are exactly the st9-
# st14/l60 gap this guard exists to catch.
UBIQUITOUS = {
    f"{PKG}/__init__.py",
    f"{PKG}/io.py",
    f"{PKG}/session.py",
    f"{PKG}/registry.py",
    f"{PKG}/queries/__init__.py",
    f"{PKG}/queries/_util.py",
}


def _git(*args: str) -> str:
    return subprocess.run(
        ["git", *args], cwd=REPO, capture_output=True, text=True, check=False
    ).stdout.strip()


def sweep_rounds(max_round: int | None = None) -> dict[str, int]:
    """query -> latest round whose CORRECTNESS file recorded it.

    ``max_round`` pins the evidence horizon: rounds above it are ignored,
    so a head generated from round-N evidence stays verifiable after the
    round-N+1 driver sweep lands its CORRECTNESS file mid-verdict."""
    out: dict[str, int] = {}
    for fname in sorted(os.listdir(REPO)):
        if not (fname.startswith("CORRECTNESS_r") and fname.endswith(".json")):
            continue
        rnd = int(fname[len("CORRECTNESS_r"):-len(".json")])
        if max_round is not None and rnd > max_round:
            continue
        try:
            with open(os.path.join(REPO, fname)) as f:
                data = json.load(f)
        except (OSError, json.JSONDecodeError):
            continue
        for q in data:
            out[q] = max(out.get(q, 0), rnd)
    return out


def sweep_times() -> dict[int, int]:
    """round -> commit time (unix) of its CORRECTNESS file.

    An on-disk but not-yet-committed CORRECTNESS file (the normal state
    right after a driver sweep: the file is committed at the NEXT round's
    start) must not read as sweep-time 0 — that would invert the guard and
    mass-flag the freshest evidence as stale.  Mirror the UNCOMMITTED
    handling for code spans: fall back to the file's mtime.
    """
    out = {}
    for fname in os.listdir(REPO):
        if fname.startswith("CORRECTNESS_r") and fname.endswith(".json"):
            rnd = int(fname[len("CORRECTNESS_r"):-len(".json")])
            ct = _git("log", "-1", "--format=%ct", "--", fname)
            if ct:
                out[rnd] = int(ct)
            else:
                out[rnd] = int(os.path.getmtime(os.path.join(REPO, fname)))
    return out


def _pkg_files() -> list[str]:
    files = []
    for root, _dirs, names in os.walk(os.path.join(REPO, PKG)):
        for n in names:
            if n.endswith(".py"):
                files.append(os.path.relpath(os.path.join(root, n), REPO))
    return sorted(files)


class _Module:
    """Top-level spans + import aliases of one package file, parsed from
    the HEAD blob (so -L line ranges are valid) and, when the working tree
    differs, from the working copy too (span-text diff => UNCOMMITTED)."""

    def __init__(self, relpath: str):
        self.relpath = relpath
        self.blob_sha = _git("rev-parse", f"HEAD:{relpath}")
        head_src = _git("show", f"HEAD:{relpath}")
        with open(os.path.join(REPO, relpath)) as f:
            work_src = f.read()
        self.spans = self._parse_spans(head_src) if head_src else {}
        work_spans = (
            self.spans if work_src == head_src else self._parse_spans(work_src)
        )
        self.dirty_spans = {
            n
            for n in set(self.spans) | set(work_spans)
            if self.spans.get(n, (0, 0, None))[2]
            != work_spans.get(n, (0, 0, None))[2]
        }
        self.aliases = self._parse_aliases(work_src)
        self.work_spans = work_spans

    @staticmethod
    def _parse_spans(src: str) -> dict[str, tuple[int, int, str]]:
        spans: dict[str, tuple[int, int, str]] = {}
        try:
            tree = ast.parse(src)
        except SyntaxError:
            return spans
        lines = src.splitlines()
        for node in tree.body:
            names: list[str] = []
            start = node.lineno
            if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
                names = [node.name]
                if node.decorator_list:
                    start = min(d.lineno for d in node.decorator_list)
            elif isinstance(node, ast.Assign):
                names = [t.id for t in node.targets if isinstance(t, ast.Name)]
            elif isinstance(node, ast.AnnAssign) and isinstance(node.target, ast.Name):
                names = [node.target.id]
            end = node.end_lineno or node.lineno
            text = "\n".join(lines[start - 1 : end])
            for n in names:
                spans[n] = (start, end, text)
        return spans

    @staticmethod
    def _parse_aliases(src: str) -> dict[str, tuple[str, str | None]]:
        """local name -> (module dotted path, original name | None for a
        whole-module alias)."""
        out: dict[str, tuple[str, str | None]] = {}
        try:
            tree = ast.parse(src)
        except SyntaxError:
            return out
        for node in ast.walk(tree):
            if isinstance(node, ast.ImportFrom) and node.module and node.module.startswith(PKG):
                for a in node.names:
                    local = a.asname or a.name
                    # "from pkg.operators import dedup as D" aliases a MODULE
                    maybe_mod = f"{node.module}.{a.name}"
                    out[local] = (node.module, a.name)
                    out.setdefault(f"__mod__{local}", (maybe_mod, None))
            elif isinstance(node, ast.Import):
                for a in node.names:
                    if a.name.startswith(PKG):
                        out[a.asname or a.name] = (a.name, None)
        return out


def _span_refs(text: str) -> tuple[set[str], dict[str, set[str]]]:
    """(bare names, attr-base -> attr names) referenced inside a span."""
    names: set[str] = set()
    attrs: dict[str, set[str]] = {}
    try:
        tree = ast.parse(text)
    except SyntaxError:
        return names, attrs
    for node in ast.walk(tree):
        if isinstance(node, ast.Name):
            names.add(node.id)
        elif isinstance(node, ast.Attribute) and isinstance(node.value, ast.Name):
            attrs.setdefault(node.value.id, set()).add(node.attr)
    return names, attrs


def _mod_path(dotted: str) -> str | None:
    rel = dotted.replace(".", "/")
    for cand in (f"{rel}.py", f"{rel}/__init__.py"):
        if os.path.exists(os.path.join(REPO, cand)):
            return cand
    return None


def compute_change_times(verbose: bool = False) -> dict[tuple[str, str], float]:
    """(relpath, span name) -> transitive last-change commit time."""
    cache: dict[str, float] = {}
    if os.path.exists(CACHE_PATH):
        try:
            with open(CACHE_PATH) as f:
                cache = json.load(f)
        except (OSError, json.JSONDecodeError):
            cache = {}

    mods = {rp: _Module(rp) for rp in _pkg_files()}
    by_name: dict[str, list[tuple[str, str]]] = {}
    for rp, m in mods.items():
        for n in m.work_spans:
            by_name.setdefault(n, []).append((rp, n))

    own: dict[tuple[str, str], float] = {}
    n_git = 0
    for rp, m in mods.items():
        for n, (start, end, _text) in m.spans.items():
            if n in m.dirty_spans:
                own[(rp, n)] = UNCOMMITTED
                continue
            key = f"{m.blob_sha}:{n}"
            if key in cache:
                own[(rp, n)] = cache[key]
                continue
            ct = _git("log", "-1", "--format=%ct", f"-L{start},{end}:{rp}")
            n_git += 1
            val = float(ct.splitlines()[0]) if ct else 0.0
            cache[key] = val
            own[(rp, n)] = val
        for n in m.dirty_spans - set(m.spans):  # brand-new, uncommitted span
            own[(rp, n)] = UNCOMMITTED
    try:
        with open(CACHE_PATH, "w") as f:
            json.dump(cache, f)
    except OSError:
        pass
    if verbose:
        print(f"[stale_evidence] {len(own)} spans, {n_git} git -L calls", file=sys.stderr)

    # reference edges: span -> spans it may call
    edges: dict[tuple[str, str], set[tuple[str, str]]] = {}
    for rp, m in mods.items():
        for n in m.work_spans:
            text = m.work_spans[n][2]
            bare, attrs = _span_refs(text)
            tgt: set[tuple[str, str]] = set()
            for b in bare:
                if b == n:
                    continue
                if b in m.work_spans:  # same-module helper wins
                    tgt.add((rp, b))
                elif b in m.aliases:
                    src_mod, orig = m.aliases[b]
                    p = _mod_path(src_mod)
                    if p and orig and orig in mods.get(p, _EMPTY).work_spans:
                        tgt.add((p, orig))
                elif b in by_name:  # cross-module over-approximation
                    tgt.update(by_name[b])
            for base, anames in attrs.items():
                mod_dotted = None
                if f"__mod__{base}" in m.aliases:
                    mod_dotted = m.aliases[f"__mod__{base}"][0]
                elif base in m.aliases and m.aliases[base][1] is None:
                    mod_dotted = m.aliases[base][0]
                p = _mod_path(mod_dotted) if mod_dotted else None
                for a in anames:
                    if p and a in mods.get(p, _EMPTY).work_spans:
                        tgt.add((p, a))
                    elif base not in m.work_spans and a in by_name:
                        tgt.update(by_name[a])
            edges[(rp, n)] = {t for t in tgt if t[0] not in UBIQUITOUS}

    # propagate max change time to a fixpoint
    times = dict(own)
    changed = True
    while changed:
        changed = False
        for span, tgts in edges.items():
            best = max([times.get(span, 0.0)] + [times.get(t, 0.0) for t in tgts])
            if best > times.get(span, 0.0):
                times[span] = best
                changed = True
    return times


class _Empty:
    work_spans: dict = {}


_EMPTY = _Empty()


def stale_report(max_round: int | None = None) -> dict[str, dict]:
    """query -> {reason, last_round, sweep_ct, change_ct} for every
    registered query whose evidence is stale (or absent)."""
    sys.path.insert(0, REPO)
    from google_analytics_dataframes_spark.registry import registry

    rounds = sweep_rounds(max_round)
    stimes = sweep_times()
    ctimes = compute_change_times()
    out: dict[str, dict] = {}
    for name, q in registry().items():
        code = q.fn.__code__
        rp = os.path.relpath(code.co_filename, REPO)
        span = (rp, code.co_name)
        change_ct = ctimes.get(span)
        if change_ct is None:
            out[name] = {"reason": f"no span found for {span}"}
            continue
        rnd = rounds.get(name)
        if rnd is None:
            out[name] = {"reason": "never swept", "change_ct": change_ct}
            continue
        sweep_ct = stimes.get(rnd, 0)
        if change_ct > sweep_ct:
            out[name] = {
                "reason": "changed after sweep",
                "last_round": rnd,
                "sweep_ct": sweep_ct,
                "change_ct": change_ct,
            }
    return out


def expected_sweep_head(budget: int = 50, max_round: int | None = None) -> list[str]:
    """The mechanically-derived sweep head (VERDICT r10 item #6): every
    stale row (changed after its last sweep, or never swept) in canonical
    registration order, then back-fill to ``budget`` with the
    oldest-driver-evidence rows (ties broken by registration order).

    queries/__init__.py's static SWEEP_HEAD must expand to exactly this
    list's first-``budget`` cut — test-enforced by
    tests/test_invariants.py::test_sweep_head_is_changed_plus_oldest_evidence
    against the pinned evidence horizon the head was generated from, so
    the hand-curated tier comments of rounds 6-10 are replaced by
    ``python tools/stale_evidence.py --emit-head [budget] [horizon]``."""
    sys.path.insert(0, REPO)
    from google_analytics_dataframes_spark.registry import registry

    stale = set(stale_report(max_round))
    rounds = sweep_rounds(max_round)
    reg_order = list(registry())
    idx = {q: i for i, q in enumerate(reg_order)}
    head = [q for q in reg_order if q in stale][:budget]
    backfill = sorted(
        (q for q in reg_order if q not in stale),
        key=lambda q: (rounds.get(q, 0), idx[q]),
    )
    return head + backfill[: max(0, budget - len(head))]


def main() -> int:
    if len(sys.argv) > 1 and sys.argv[1] == "--emit-head":
        budget = int(sys.argv[2]) if len(sys.argv) > 2 else 50
        horizon = int(sys.argv[3]) if len(sys.argv) > 3 else None
        names = expected_sweep_head(budget, horizon)
        n_stale = len(stale_report(horizon))
        print(f"# generated: tools/stale_evidence.py --emit-head {budget}"
              f" {horizon if horizon is not None else ''}".rstrip())
        print(f"# {n_stale} stale/changed rows lead; oldest-evidence back-fill to {budget}")
        for n in names:
            print(f'    "{n}",')
        return 0
    rep = stale_report()
    if not rep:
        print("all registered queries: driver evidence postdates last code change")
        return 0
    for name, info in sorted(rep.items()):
        cc = info.get("change_ct")
        cc = "uncommitted" if cc == UNCOMMITTED else cc
        print(f"STALE {name}: {info['reason']} (last_round={info.get('last_round')}, change_ct={cc})")
    print(f"\n{len(rep)} quer{'y' if len(rep) == 1 else 'ies'} with stale/absent driver evidence")
    return 1


if __name__ == "__main__":
    sys.exit(main())
