"""Pin bench.py's driver-facing output under the harness's tail window.

The round harness records only the LAST 2000 BYTES of bench stdout and
parses the JSON line from that tail. Round 6's single ~4.5 KB line was
truncated mid-JSON and the official perf record came back
``"parsed": null``. These tests pin the round-7 fix: the final stdout
line (``compact_record``) must stay parseable and under the window for
any realistic registry size — including a registry far larger than
today's, with pathologically long query names and error entries.
"""

from __future__ import annotations

import json

import pytest

from bench import COMPACT_BYTE_BUDGET, compact_record


def _fake_out(n_queries: int, name_len: int = 40, with_errors: bool = True) -> dict:
    names = [f"q{i:03d}_" + "x" * name_len for i in range(n_queries)]
    timings: dict[str, object] = {n: round(0.5 + i * 0.137, 3) for i, n in enumerate(names)}
    errors = 0
    if with_errors:
        for n in names[:5]:
            timings[n] = {"error": "AnalysisException: " + "y" * 250}
            errors += 1
    out = {
        "metric": "registry_queries_total_wall",
        "value": 123.456,
        "unit": "sec",
        "queries": timings,
        "sf": 0.1,
        "reps": 3,
        "n_queries": n_queries,
        "headline_total": 23.9,
        "excluded": {},
        "rep_spread": {n: 1.0 + (i % 17) / 10 for i, n in enumerate(names)},
        "calib_pre_s": 0.911,
        "calib_s": 1.234,
        "calib_spread": 1.61,
        "calib_nominal_s": 1.2,
        "spread_med": 1.31,
        "cpus": 32,
        "head": "abc1234",
        "code_fp": "fp0000000001",
    }
    if errors:
        out["errors"] = errors
    return out


@pytest.mark.parametrize("n_queries", [10, 74, 200, 1000])
def test_compact_line_fits_driver_window(n_queries: int) -> None:
    line = compact_record(_fake_out(n_queries))
    assert len(line.encode()) < COMPACT_BYTE_BUDGET
    assert "\n" not in line  # must be ONE line — the driver parses lines

    parsed = json.loads(line)
    # Schema the driver expects, plus the pointer to the full record.
    assert parsed["metric"] == "registry_queries_total_wall"
    assert parsed["value"] == 123.456
    assert parsed["unit"] == "sec"
    assert parsed["sf"] == 0.1
    assert parsed["n_queries"] == n_queries
    assert parsed["full"] == "BENCH_FULL.json"
    # r9 steal-legibility fields: the fixed-work sentinel and the
    # median rep spread ride the compact line so any official record
    # can be normalized without forensics against a builder re-run.
    assert parsed["calib_pre_s"] == 0.911
    assert parsed["calib_s"] == 1.234
    assert parsed["calib_spread"] == 1.61
    assert parsed["spread_med"] == 1.31
    # r17 (r16 VERDICT items 1/2): core count + code version ride the
    # driver-parsed line so bank-scoping bugs are self-evident.
    assert parsed["cpus"] == 32
    assert parsed["head"] == "abc1234"
    assert len(parsed["queries"]) <= 10
    # Only successful timings appear; error dicts never leak into the
    # compact map (they'd blow the budget and aren't sortable).
    assert all(isinstance(v, (int, float)) for v in parsed["queries"].values())
    # The compact map carries the SLOWEST queries — the triage set.
    if parsed["queries"]:
        ok = {n: t for n, t in _fake_out(n_queries)["queries"].items() if isinstance(t, (int, float))}
        slowest = max(ok.values())
        assert slowest in parsed["queries"].values()
    assert set(parsed["rep_spread"]) == set(parsed["queries"])


def test_compact_line_shrinks_under_extreme_names() -> None:
    # 200-char names would make even 10 entries exceed the budget; the
    # builder must shrink the slowest-list rather than overflow.
    line = compact_record(_fake_out(74, name_len=200))
    assert len(line.encode()) < COMPACT_BYTE_BUDGET
    assert json.loads(line)["value"] == 123.456


def test_compact_line_reports_error_count() -> None:
    assert json.loads(compact_record(_fake_out(74)))["errors"] == 5
    assert json.loads(compact_record(_fake_out(74, with_errors=False)))["errors"] == 0


def _out_with_calib(calib_s: float, sf: float = 0.1, errors: int = 0) -> dict:
    out = _fake_out(20, with_errors=False)
    out["sf"] = sf
    out["calib_pre_s"] = calib_s
    out["calib_s"] = calib_s
    if errors:
        out["errors"] = errors
    return out


def _banked(best, cpus=32):
    """Read the per-cpus bank record (r17 format: one record per core
    count; legacy single-record files are upgraded on write)."""
    return json.loads(best.read_text())[str(cpus)]


def test_best_sweep_sidecar_keeps_cleanest_and_masks_steal(tmp_path):
    """r13 (verdict item 9): a clean sweep banks into BENCH_BEST.json;
    a later steal-window sweep of the same round/SF/query-set emits the
    banked line (tagged with provenance); a clean later sweep emits
    itself and replaces the bank. Different round / query set / SF or
    an errored/narrowed sweep never banks or borrows."""
    from bench import CALIB_NOMINAL_S, resolve_final_line

    best = tmp_path / "BENCH_BEST.json"
    names = [f"q{i}" for i in range(20)]
    clean = _out_with_calib(CALIB_NOMINAL_S * 1.01)
    clean_line = compact_record(clean)
    got = resolve_final_line(clean, clean_line, names, False, best, 13)
    assert got == clean_line and best.exists()

    noisy = _out_with_calib(CALIB_NOMINAL_S * 1.4)
    noisy["value"] = 999.0
    noisy_line = compact_record(noisy)
    got = resolve_final_line(noisy, noisy_line, names, False, best, 13)
    emitted = json.loads(got)
    assert emitted["from_best_sweep"] is True
    assert emitted["value"] == 123.456  # the banked clean sweep's total
    assert emitted["this_sweep_calib_s"] == noisy["calib_s"]
    assert len(got.encode()) < COMPACT_BYTE_BUDGET
    # the noisy sweep did NOT overwrite the bank
    assert _banked(best)["compact"]["value"] == 123.456

    # mildly-noisy (<= gate) sweeps emit themselves
    mild = _out_with_calib(CALIB_NOMINAL_S * 1.1)
    mild_line = compact_record(mild)
    assert resolve_final_line(mild, mild_line, names, False, best, 13) == mild_line

    # errored or narrowed sweeps never bank (even when cleaner)
    errored = _out_with_calib(CALIB_NOMINAL_S * 0.99, errors=2)
    resolve_final_line(errored, compact_record(errored), names, False, best, 13)
    assert _banked(best)["compact"]["value"] == 123.456
    narrowed = _out_with_calib(CALIB_NOMINAL_S * 0.98)
    narrowed["value"] = 1.0
    resolve_final_line(narrowed, compact_record(narrowed), names, True, best, 13)
    assert _banked(best)["compact"]["value"] == 123.456
    # a different query set never borrows the bank — it REPLACES it
    # (a gate swap makes the old bank stale; the current sweep is the
    # best known for the new registry, noisy or not)
    got = resolve_final_line(noisy, noisy_line, names + ["new_q"], False, best, 13)
    assert got == noisy_line
    assert _banked(best)["compact"]["value"] == 999.0
    # same for a DIFFERENT round: the old round's bank must never mask
    # this round's real perf, so the rollover re-banks the current sweep
    got = resolve_final_line(noisy, noisy_line, names + ["new_q"], False, best, 14)
    assert got == noisy_line
    assert _banked(best)["round"] == 14
    # a corrupt sidecar is survivable: current line comes back (and the
    # sweep re-banks over the corruption)
    best.write_text("{not json")
    assert resolve_final_line(noisy, noisy_line, names, False, best, 13) == noisy_line


def test_best_sweep_sidecar_scoped_by_cpus_and_code(tmp_path):
    """r17 (r16 VERDICT item 1): the bank key includes core count and
    the CODE fingerprint. r16's 8-core scaling sweep had its final line
    silently replaced by the 32-core banked record (all driver scaling
    ratios read exactly 1.0), and the banked 'after' predated the
    round's last three commits. A banked record from a different cpus
    or different code must never substitute; the current sweep re-banks
    instead. Code identity is the content fingerprint, NOT git HEAD —
    artifact-only commits (BENCH_*.json) must keep a clean bank valid
    for the driver's sweep."""
    from bench import CALIB_NOMINAL_S, resolve_final_line

    best = tmp_path / "BENCH_BEST.json"
    names = [f"q{i}" for i in range(20)]
    clean = _out_with_calib(CALIB_NOMINAL_S * 1.01)  # cpus=32 fp...0001
    clean_line = compact_record(clean)
    assert resolve_final_line(clean, clean_line, names, False, best, 17) == clean_line
    banked = _banked(best)
    assert banked["cpus"] == 32 and banked["code_fp"] == "fp0000000001"

    # same round/SF/query-set but 8 cores: the 32-core bank must NOT be
    # borrowed — the noisy 8-core sweep emits itself and re-banks.
    noisy8 = _out_with_calib(CALIB_NOMINAL_S * 1.4)
    noisy8["cpus"] = 8
    noisy8["value"] = 777.0
    noisy8_line = compact_record(noisy8)
    assert resolve_final_line(noisy8, noisy8_line, names, False, best, 17) == noisy8_line
    # the 8-core record banks in ITS OWN slot; the 32-core bank survives
    assert _banked(best, 8)["cpus"] == 8
    assert _banked(best, 32)["compact"]["value"] == 123.456

    # likewise changed code: the stale-code bank never masks new code.
    clean["value"] = 123.456
    resolve_final_line(clean, compact_record(clean), names, False, best, 17)
    noisy_new_code = _out_with_calib(CALIB_NOMINAL_S * 1.4)
    noisy_new_code["code_fp"] = "fp0000000002"
    noisy_new_code["value"] = 888.0
    line = compact_record(noisy_new_code)
    assert resolve_final_line(noisy_new_code, line, names, False, best, 17) == line
    assert _banked(best)["code_fp"] == "fp0000000002"

    # a HEAD-only difference (artifact commit) still borrows the bank:
    # head is provenance, code_fp is the key
    clean2 = _out_with_calib(CALIB_NOMINAL_S * 1.01)
    clean2["code_fp"] = "fp0000000002"
    resolve_final_line(clean2, compact_record(clean2), names, False, best, 17)
    noisy_same_code = _out_with_calib(CALIB_NOMINAL_S * 1.4)
    noisy_same_code["code_fp"] = "fp0000000002"
    noisy_same_code["head"] = "artifactcmt"
    noisy_same_code["value"] = 999.0
    got = json.loads(
        resolve_final_line(
            noisy_same_code, compact_record(noisy_same_code), names,
            False, best, 17,
        )
    )
    assert got["from_best_sweep"] is True and got["value"] == 123.456
