"""Driver-window rotation discipline (VERDICT r3 next-round #3).

The round driver records a correctness row for only the FIRST
``WINDOW`` entries of ``__spark_entry__.queries()``; the rest of the
contract is re-verified only by the builder's local gate that round.
This tool fails if the current dict order would let any query go more
than ``MAX_STALE`` consecutive rounds without an official driver row —
run it after reordering each round, and in pytest (test_bench_contract
imports check()).

Rules checked against the last ``MAX_STALE`` CORRECTNESS_r*.json files:
 1. every query name in queries() must either sit inside the first
    WINDOW slots now, or have a green row in one of those files;
 2. any query that was RED in the most recent round must sit inside the
    window (a fix is unverified until the driver re-records it);
 3. names present in queries() but absent from every recent round and
    outside the window are flagged as never-recorded (new queries must
    enter through the window);
 4. (VERDICT r4 #1) a query whose IMPLEMENTATION changed since its last
    green driver round must sit inside the window: each query is mapped
    to its operator modules by a static import walk of its q_* function
    (function-local ``from ieps_crawler_spark...`` imports, plus one
    hop through plans/ orchestration modules), and git is asked
    whether any of those files — or the q_* function source itself —
    differs from the commit that recorded the query's last green
    CORRECTNESS row. Staleness checking alone is blind to this case
    (r4's graph_spam_mass shipped a changed operator one slot past the
    window with no fresh driver row). Drift is judged at FUNCTION
    granularity for operator modules: a changed file only flags the
    queries whose imported names (closed over the module's own
    internal references — helpers, defaults, module constants) have
    changed source; purely additive edits to a module flag nothing.
    File granularity would exceed the driver's fixed 50-slot window
    the moment one busy module gains an unrelated function (the r5 PNG
    codec landing in operators/multimodal.py must not evict two
    r3-stale queries from the window). plans/ modules keep file
    granularity — they are orchestration, any change there is the
    crawl queries' implementation.
 5. (r5) ORACLE drift: a query whose emitted oracle_sql() TEXT differs
    from what the recording commit emitted must also re-enter the
    window — a stale green row says nothing about a rewritten oracle.
    Compared at EMISSION level (both revisions' oracle_sql() run in
    subprocesses), so refactoring a shared SQL builder flags nothing
    as long as the produced SQL is byte-identical.

Usage: python tools/window_rotation.py [--window 50] [--stale 2]
"""

from __future__ import annotations

import ast
import functools
import glob
import json
import os
import re
import subprocess
import sys

WINDOW = 50
MAX_STALE = 2

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def query_order(repo: str = _REPO) -> list[str]:
    """Parse queries() dict order WITHOUT importing pyspark (the tool
    must stay runnable as a fast pre-commit check)."""
    src = open(os.path.join(repo, "__spark_entry__.py")).read()
    m = re.search(r"def queries\(\).*?return \{(.*?)\n    \}", src, re.S)
    if not m:
        raise RuntimeError("queries() dict not found")
    return [
        n for n, _ in re.findall(r'"([a-z0-9_]+)":\s*(q_[a-z0-9_]+),', m.group(1))
    ]


def recent_rounds(repo: str = _REPO, n: int = MAX_STALE) -> list[tuple[str, dict]]:
    """Last n CORRECTNESS_r*.json files, newest first."""
    files = sorted(
        glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")),
        key=lambda p: int(re.search(r"r(\d+)", os.path.basename(p)).group(1)),
        reverse=True,
    )
    return [(os.path.basename(p), json.load(open(p))) for p in files[:n]]


def _green(rec: dict) -> bool:
    return bool(
        rec.get("rows_match")
        and rec.get("schema_match")
        and rec.get("hash_match", True)
        and not rec.get("err")
    )


def _resolve_module_file(repo: str, dotted: str) -> str | None:
    """ieps_crawler_spark.x.y -> repo-relative file path, or None."""
    rel = dotted.replace(".", "/")
    for cand in (f"{rel}.py", f"{rel}/__init__.py"):
        if os.path.isfile(os.path.join(repo, cand)):
            return cand
    return None


def _module_imports(repo: str, relpath: str, pkg: str = "ieps_crawler_spark") -> set[str]:
    """Intra-package files imported (absolutely or relatively) anywhere
    in the given module file."""
    try:
        tree = ast.parse(open(os.path.join(repo, relpath)).read())
    except (OSError, SyntaxError):
        return set()
    cur_pkg = os.path.dirname(relpath).replace("/", ".")
    out: set[str] = set()
    for node in ast.walk(tree):
        targets: list[str] = []
        if isinstance(node, ast.ImportFrom):
            if node.level:  # relative: from ..operators.seen import x
                base = cur_pkg.split(".")
                base = base[: len(base) - (node.level - 1)]
                mod = ".".join(base + ([node.module] if node.module else []))
                targets.append(mod)
                # `from . import seen` style: names are submodules
                for a in node.names:
                    targets.append(f"{mod}.{a.name}")
            elif node.module and node.module.startswith(pkg):
                targets.append(node.module)
                for a in node.names:
                    targets.append(f"{node.module}.{a.name}")
        elif isinstance(node, ast.Import):
            targets.extend(
                a.name for a in node.names if a.name.startswith(pkg)
            )
        for t in targets:
            f = _resolve_module_file(repo, t)
            if f:
                out.add(f)
    return out


def query_imports(repo: str = _REPO) -> dict[str, dict]:
    """query name -> {repo-relative package file: frozenset of imported
    names, or None for file-granular}. The function-local imports of
    the q_* function (following entry-local helpers like
    q_crawl_e2e -> _crawl_results), plus ONE transitive hop through any
    ``plans/`` module. plans/ files (and their hop targets) map to
    None: plans are thin orchestration, any change there IS the crawl
    queries' implementation. Operator modules map to the exact imported
    names so drift can be judged at function granularity. Deliberately
    NOT a full package closure: file-granular transitivity
    over-triggers (operators/dedup.py imports operators/graph.py for
    its cluster step, which would pull every dedup query into any
    graph-side change and blow past the driver's fixed 50-slot
    window)."""
    src = open(os.path.join(repo, "__spark_entry__.py")).read()
    m = re.search(r"def queries\(\).*?return \{(.*?)\n    \}", src, re.S)
    name_to_fn = dict(
        re.findall(r'"([a-z0-9_]+)":\s*(q_[a-z0-9_]+),', m.group(1))
    )
    tree = ast.parse(src)
    top_fns = {
        n.name: n
        for n in tree.body
        if isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef))
    }
    fn_imports: dict[str, dict] = {}
    fn_calls: dict[str, set[str]] = {}
    for name, node in top_fns.items():
        direct: dict = {}
        calls: set[str] = set()
        for sub in ast.walk(node):
            if isinstance(sub, ast.ImportFrom) and (sub.module or "").startswith(
                "ieps_crawler_spark"
            ):
                f = _resolve_module_file(repo, sub.module)
                if f:
                    got = frozenset(a.name for a in sub.names)
                    direct[f] = (direct.get(f) or frozenset()) | got
            elif isinstance(sub, ast.Import):
                for a in sub.names:
                    if a.name.startswith("ieps_crawler_spark"):
                        f = _resolve_module_file(repo, a.name)
                        if f:
                            direct[f] = None  # whole-module import
            elif isinstance(sub, ast.Name) and sub.id in top_fns:
                # entry-local helper (q_crawl_e2e -> _crawl_results):
                # its imports belong to every query routed through it
                calls.add(sub.id)
        fn_imports[name] = direct
        fn_calls[name] = calls

    def _with_helpers(fn: str) -> dict:
        seen_fns: set[str] = set()
        stack = [fn]
        merged: dict = {}
        while stack:
            f = stack.pop()
            if f in seen_fns:
                continue
            seen_fns.add(f)
            for path, names in fn_imports.get(f, {}).items():
                if names is None or merged.get(path, frozenset()) is None:
                    merged[path] = None
                else:
                    merged[path] = merged.get(path, frozenset()) | names
            stack.extend(fn_calls.get(f, set()) - seen_fns)
        for p in list(merged):
            if p.startswith("ieps_crawler_spark/plans/"):
                merged[p] = None  # orchestration: file-granular
                for hop in _module_imports(repo, p):
                    merged.setdefault(hop, None)
        return merged

    return {q: _with_helpers(fn) for q, fn in name_to_fn.items()}


def query_modules(repo: str = _REPO) -> dict[str, set[str]]:
    """query name -> set of package files (coarse view of
    query_imports, kept for coverage tests and reporting)."""
    return {q: set(files) for q, files in query_imports(repo).items()}


def _module_defs(src: str):
    """Module source -> (name -> source segment, name -> referenced
    module-level names) for every top-level def/class/assignment."""
    try:
        tree = ast.parse(src)
    except SyntaxError:
        return {}, {}
    defs: dict = {}
    nodes: dict = {}
    for node in tree.body:
        names: list[str] = []
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
            names = [node.name]
        elif isinstance(node, ast.Assign):
            names = [t.id for t in node.targets if isinstance(t, ast.Name)]
        elif isinstance(node, ast.AnnAssign) and isinstance(node.target, ast.Name):
            names = [node.target.id]
        seg = ast.get_source_segment(src, node)
        for n in names:
            defs[n] = seg
            nodes[n] = node
    refs = {
        n: {x.id for x in ast.walk(node) if isinstance(x, ast.Name)}
        & defs.keys()
        for n, node in nodes.items()
    }
    return defs, refs


def functions_changed(
    repo: str, relpath: str, names, anchor: str | None
) -> list[str]:
    """Which of ``names`` (closed over the module's CURRENT internal
    references — helpers, default-arg callables, module constants)
    have different source at ``anchor`` vs the working tree. A module
    file absent at the anchor counts as all-changed. Function-level
    drift: additive edits elsewhere in the file flag nothing."""
    if anchor is None:
        return []
    now_src = open(os.path.join(repo, relpath)).read()
    then_src = _git(repo, "show", f"{anchor}:{relpath}")
    if not then_src:
        return sorted(names)
    now_defs, now_refs = _module_defs(now_src)
    then_defs, _ = _module_defs(then_src)
    closure: set[str] = set()
    stack = [n for n in names]
    while stack:
        n = stack.pop()
        if n in closure or n not in now_defs:
            continue
        closure.add(n)
        stack.extend(now_refs.get(n, set()) - closure)
    return sorted(
        n for n in closure if then_defs.get(n) != now_defs.get(n)
    )


def _git(repo: str, *args: str) -> str:
    return subprocess.run(
        ["git", "-C", repo, *args], capture_output=True, text=True
    ).stdout


@functools.lru_cache(maxsize=None)
def _round_anchor(repo: str, round_file: str) -> str | None:
    """Commit that last touched the given CORRECTNESS file."""
    out = _git(repo, "log", "-n1", "--format=%H", "--", round_file).strip()
    return out or None


@functools.lru_cache(maxsize=None)
def changed_since_round(repo: str, round_file: str) -> frozenset:
    """Package files (plus __spark_entry__.py) whose content differs
    between the commit that recorded ``round_file`` and the CURRENT
    WORKING TREE (committed or not — uncommitted operator edits must
    re-enter the window too)."""
    anchor = _round_anchor(repo, round_file)
    if anchor is None:  # not a git checkout: rule 4 degrades silently
        return frozenset()
    out = _git(
        repo, "diff", "--name-only", anchor, "--",
        "ieps_crawler_spark", "__spark_entry__.py",
    )
    return frozenset(line for line in out.splitlines() if line)


@functools.lru_cache(maxsize=None)
def _entry_fn_sources(repo: str, ref: str | None) -> dict:
    """Map of top-level function name -> source text of
    __spark_entry__.py at ``ref`` (None = working tree)."""
    if ref is None:
        src = open(os.path.join(repo, "__spark_entry__.py")).read()
    else:
        src = _git(repo, "show", f"{ref}:__spark_entry__.py")
        if not src:
            return {}
    try:
        tree = ast.parse(src)
    except SyntaxError:
        return {}
    return {
        n.name: ast.get_source_segment(src, n)
        for n in tree.body
        if isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef))
    }


def query_fn_changed(repo: str, query: str, round_file: str) -> bool:
    """True when the query's q_* function source in __spark_entry__.py
    differs from the version committed with ``round_file``."""
    anchor = _round_anchor(repo, round_file)
    if anchor is None:
        return False
    src = open(os.path.join(repo, "__spark_entry__.py")).read()
    m = re.search(r"def queries\(\).*?return \{(.*?)\n    \}", src, re.S)
    fn = dict(
        re.findall(r'"([a-z0-9_]+)":\s*(q_[a-z0-9_]+),', m.group(1))
    ).get(query)
    if fn is None:
        return False
    now = _entry_fn_sources(repo, None).get(fn)
    then = _entry_fn_sources(repo, anchor).get(fn)
    return then is not None and now != then


@functools.lru_cache(maxsize=None)
def _emitted_oracles(repo: str, ref: str | None):
    """oracle_sql() emission of __spark_entry__.py at ``ref`` (None =
    working tree), produced in a subprocess (the module imports pyspark
    but emission starts no session). None when the emission fails —
    rule 5 then degrades silently for that revision."""
    import shutil
    import subprocess
    import tempfile

    code = (
        "import json, sys; import __spark_entry__ as e; "
        "print(json.dumps(e.oracle_sql()))"
    )
    tmpdir = None
    try:
        if ref is None:
            cwd = repo
        else:
            src = _git(repo, "show", f"{ref}:__spark_entry__.py")
            if not src:
                return None
            tmpdir = tempfile.mkdtemp(prefix="wr_oracle_")
            with open(os.path.join(tmpdir, "__spark_entry__.py"), "w") as f:
                f.write(src)
            cwd = tmpdir
        r = subprocess.run(
            [sys.executable, "-c", code], cwd=cwd, capture_output=True,
            text=True, timeout=300,
            env={**os.environ, "PYTHONPATH": repo},
        )
        if r.returncode != 0:
            return None
        return json.loads(r.stdout.strip().splitlines()[-1])
    except Exception:
        return None
    finally:
        if tmpdir:
            shutil.rmtree(tmpdir, ignore_errors=True)


def oracle_changed(repo: str, query: str, round_file: str) -> bool:
    """True when the query's emitted oracle SQL differs between the
    recording commit and the working tree."""
    anchor = _round_anchor(repo, round_file)
    if anchor is None:
        return False
    now = _emitted_oracles(repo, None)
    then = _emitted_oracles(repo, anchor)
    if not now or not then:
        return False
    return (
        query in then and query in now and then[query] != now[query]
    )


def check(
    repo: str = _REPO, window: int = WINDOW, stale: int = MAX_STALE
) -> list[str]:
    """Return a list of violation strings (empty = ok)."""
    order = query_order(repo)
    rounds = recent_rounds(repo, stale)
    in_window = set(order[:window])
    problems = []
    green_recently = set()
    for _, recs in rounds:
        green_recently |= {q for q, r in recs.items() if _green(r)}
    latest = rounds[0][1] if rounds else {}
    for q in order:
        if q in in_window:
            continue
        if q not in green_recently:
            if any(q in recs for _, recs in rounds):
                problems.append(
                    f"{q}: red/errored in the last {stale} round(s) but "
                    f"outside the {window}-slot window"
                )
            else:
                problems.append(
                    f"{q}: no driver row in the last {stale} round(s) and "
                    f"outside the {window}-slot window"
                )
    for q, rec in latest.items():
        if q in order and not _green(rec) and q not in in_window:
            problems.append(
                f"{q}: RED last round but outside the window — the fix "
                f"cannot be driver-recorded"
            )
    # rule 4: implementation drift since the last green driver row
    try:
        q_imp = query_imports(repo)
    except Exception as e:  # parse failure must surface, not pass green
        return problems + [f"rule-4 module walk failed: {e}"]
    for q in order:
        if q in in_window:
            continue
        last_green = next(
            (name for name, recs in rounds if q in recs and _green(recs[q])),
            None,
        )
        if last_green is None:
            continue  # already flagged by rules 1-3
        touched = changed_since_round(repo, last_green)
        anchor = _round_anchor(repo, last_green)
        drifted = []
        for f, names in sorted(q_imp.get(q, {}).items()):
            if f not in touched:
                continue
            if names is None:  # plans/whole-module: file granular
                drifted.append(f)
            else:
                ch = functions_changed(repo, f, names, anchor)
                if ch:
                    drifted.append(f"{f} ({', '.join(ch)})")
        if drifted:
            problems.append(
                f"{q}: implementation drift in {'; '.join(drifted)} "
                f"since its last green driver row ({last_green}) but the "
                f"query is outside the {window}-slot window"
            )
        elif query_fn_changed(repo, q, last_green):
            problems.append(
                f"{q}: its q_* function in __spark_entry__.py changed "
                f"since its last green driver row ({last_green}) but the "
                f"query is outside the {window}-slot window"
            )
        elif oracle_changed(repo, q, last_green):
            problems.append(
                f"{q}: its emitted oracle SQL changed since its last "
                f"green driver row ({last_green}) but the query is "
                f"outside the {window}-slot window"
            )
    return problems


def main() -> None:
    window, stale = WINDOW, MAX_STALE
    args = sys.argv[1:]
    while args:
        a = args.pop(0)
        if a == "--window":
            window = int(args.pop(0))
        elif a == "--stale":
            stale = int(args.pop(0))
        else:
            raise SystemExit(f"unknown arg {a}")
    problems = check(window=window, stale=stale)
    order = query_order()
    rounds = [name for name, _ in recent_rounds(n=stale)]
    print(
        f"{len(order)} queries; window={window}; rounds checked: "
        f"{', '.join(rounds) or 'none'}"
    )
    for p in problems:
        print(f"VIOLATION  {p}")
    print(f"{len(problems)} violations")
    sys.exit(1 if problems else 0)


if __name__ == "__main__":
    main()
