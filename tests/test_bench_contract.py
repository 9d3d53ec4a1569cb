"""bench.py driver contract: the FINAL stdout line must parse as JSON
and fit the driver's 2000-char tail capture at any query count (round-2
post-mortem: one giant line -> BENCH_r02.json parsed:null)."""

import json

from bench import FINAL_LINE_BUDGET, final_line


def _crawl(ups):
    return {
        "sec": 123.456, "wave_sec": 99.999, "urls": 2_642_986, "waves": 24,
        "corpus_pages": 5_000_000, "urls_per_sec": ups,
        "per_wave": [{"fetched": 10**6, "sec": 9.9, "deltas": 4.4,
                      "snap": 5.5}] * 48,
    }


def test_final_line_fits_budget_at_any_scale():
    results = {f"very_long_query_name_family_{i:03d}": 123.456
               for i in range(200)}
    results["crawl"] = 999.999
    extras = {c: _crawl(30000.5) for c in
              ("crawl", "crawl_bloom", "crawl_cuckoo", "crawl_capped",
               "crawl_capped_bloom")}
    out = final_line(results, extras, 0.1, 32)
    line = json.dumps(out, separators=(",", ":"))
    assert len(line) <= FINAL_LINE_BUDGET, len(line)
    assert json.loads(line)["n_queries"] == 201
    assert "per_wave" not in line
    assert out["crawl"]["urls"] == 2_642_986
    assert out["ups_capped_bloom"] == 30000.5
    # slowest queries survive truncation
    assert "crawl" in out["queries"]


def test_final_line_keeps_all_queries_when_small():
    results = {"a": 1.0, "b": 2.0}
    out = final_line(results, {}, 0.01, 8)
    assert out["queries"] == {"a": 1.0, "b": 2.0}
    assert out["suite_sec"] == 3.0
    # headline triple is coherent: throughput metric carries a
    # throughput value (0 when no crawl config ran)
    assert out["unit"] == "urls/sec" and out["value"] == 0.0


def test_window_rotation_discipline():
    """No query may go >MAX_STALE rounds without a driver correctness
    row, and last round's reds must sit inside the driver window
    (VERDICT r3 next-round #3, enforced mechanically)."""
    from tools.window_rotation import check

    assert check() == []


def test_window_rotation_detects_buried_red(tmp_path):
    """Synthetic repo: a red query outside the window must be flagged."""
    import json as _json

    from tools.window_rotation import check

    entry = tmp_path / "__spark_entry__.py"
    qdict = "".join(f'        "q{i}": q_x,\n' for i in range(3))
    entry.write_text(f"def queries():\n    return {{\n{qdict}    }}\n")
    (tmp_path / "CORRECTNESS_r01.json").write_text(_json.dumps({
        "q2": {"rows_match": True, "schema_match": True,
               "hash_match": False, "err": None},
    }))
    problems = check(repo=str(tmp_path), window=2, stale=2)
    assert any("q2" in p and "RED" in p for p in problems)


def test_window_rotation_flags_changed_module(monkeypatch):
    """VERDICT r4 #1 (rule 4): a query whose operator implementation
    changed since its last green driver round must re-enter the window
    — the staleness rules alone were blind to exactly this (r4's
    graph_spam_mass). Synthetic fixture: pretend one outside-window
    query's module AND its imported function changed; the tool reds."""
    import tools.window_rotation as wr

    order = wr.query_order()
    outside = order[wr.WINDOW:]
    assert outside, "contract no longer exceeds the window?"
    mods = wr.query_modules(wr._REPO)
    victim = next(q for q in outside if mods.get(q))
    target = sorted(mods[victim])[0]
    monkeypatch.setattr(
        wr, "changed_since_round", lambda repo, rf: frozenset({target})
    )
    monkeypatch.setattr(
        wr, "functions_changed",
        lambda repo, relpath, names, anchor: sorted(names)[:1],
    )
    problems = wr.check()
    assert any(victim in p and "drift" in p for p in problems)


def test_rule4_function_granularity():
    """Function-level drift precision (r5): the r5 session changed
    trustrank/spam_mass (nodes= guards) and added PNG functions to
    operators/multimodal.py — rule 4 must flag the former and NOT flag
    queries whose imported multimodal functions are untouched (file
    granularity would overflow the driver's fixed 50-slot window on
    any additive edit to a busy module)."""
    import tools.window_rotation as wr

    anchor = wr._round_anchor(wr._REPO, "CORRECTNESS_r04.json")
    if anchor is None:
        import pytest
        pytest.skip("no git history for CORRECTNESS_r04.json")
    g = "ieps_crawler_spark/operators/graph.py"
    assert wr.functions_changed(wr._REPO, g, ["trustrank"], anchor)
    assert wr.functions_changed(wr._REPO, g, ["spam_mass"], anchor)
    assert wr.functions_changed(wr._REPO, g, ["pagerank"], anchor) == []
    m = "ieps_crawler_spark/operators/multimodal.py"
    assert wr.functions_changed(
        wr._REPO, m,
        ["extract_media_meta", "resize_media", "frame_sample_plan"],
        anchor,
    ) == []


def test_rule5_flags_oracle_drift(monkeypatch):
    """r5 rule 5: a query whose EMITTED oracle SQL differs from what
    its recording commit emitted must re-enter the window (a stale
    green row says nothing about a rewritten oracle). Synthetic: fake
    a one-query emission diff for an outside-window query."""
    import tools.window_rotation as wr

    victim = wr.query_order()[wr.WINDOW:][0]

    def fake_emit(repo, ref):
        base = {victim: "SELECT 1"}
        if ref is not None:
            base = {victim: "SELECT 2"}
        return base

    monkeypatch.setattr(wr, "_emitted_oracles", fake_emit)
    problems = wr.check()
    assert any(victim in p and "oracle SQL changed" in p for p in problems)


def test_rule5_emission_identical_refactor_is_green():
    """The r5 shared-builder refactor (_kmeans_cte_chain) must emit
    byte-identical SQL for every carried query — the live repo's rule 5
    passes (covered by test_window_rotation_discipline) and the two
    emissions agree except for the two new r5 queries."""
    import tools.window_rotation as wr

    anchor = wr._round_anchor(wr._REPO, "CORRECTNESS_r04.json")
    if anchor is None:
        import pytest
        pytest.skip("no git history for CORRECTNESS_r04.json")
    now = wr._emitted_oracles(wr._REPO, None)
    then = wr._emitted_oracles(wr._REPO, anchor)
    if not now or not then:
        import pytest
        pytest.skip("oracle emission unavailable")
    changed = [q for q in then if q in now and then[q] != now[q]]
    assert changed == []
    assert set(now) - set(then) == {
        "dedup_semantic_learned", "graph_clustering_approx",
    }


def test_query_module_map_covers_contract():
    """The static import walk must find operator modules for the
    overwhelming majority of queries (a query mapped to nothing is
    invisible to rule 4). Spot-checks: crawl queries see plans/wave.py
    through the plans one-hop; graph queries see operators/graph.py."""
    import tools.window_rotation as wr

    mods = wr.query_modules(wr._REPO)
    unmapped = [q for q, m in mods.items() if not m]
    # pure-DataFrame queries (no package import) legitimately map to
    # nothing; they change only via their own q_* source, which rule 4
    # checks separately
    assert len(unmapped) < len(mods) // 2, unmapped
    assert "ieps_crawler_spark/plans/wave.py" in mods["crawl_e2e"]
    assert "ieps_crawler_spark/operators/graph.py" in mods["graph_pagerank"]


def test_bench_compare_normalizes_by_canary():
    """VERDICT r3 #9: per-query drift is judged AFTER dividing out box
    speed (crawl canary), so a uniformly slow VM flags nothing while a
    genuinely 6x query still reds."""
    from tools.bench_compare import compare

    base = {"queries": {"crawl": 80.0, "a": 4.0, "b": 2.0, "c": 0.1}}
    new = {"queries": {"crawl": 160.0, "a": 8.0, "b": 24.0, "c": 0.2,
                       "d": 1.0}}
    rows = {r[0]: r[1] for r in compare(new, base)}
    assert rows == {"a": "ok", "b": "regressed", "c": "fast", "d": "new"}
