#!/usr/bin/env python3
"""Parallel two-SF oracle gate — the committed form of the round-15 session
ritual (13 hand-chunked check_oracle.py processes).

Usage:
    python3 tools/parallel_oracle.py <sfDir> <verifyOutDir> [-j N]
        [--out FILE.json] [--run-verify] [query ...]

With --run-verify the tool runs the ENGINE side first
(`sbt -batch "runMain graft.Verify <sfDir> <verifyOutDir>"`), asserts no
per-query `[verify] ... failed:` lines (Verify swallows them and still
exits 0), and reports the engine wall next to the compare wall — the
two-SF gate is then literally one command per SF. Without the flag it
assumes the dump already ran.
Runs every oracle compare (the check_oracle.py comparison shape: row count,
sorted column names, order-insensitive value hash, HUGEINT guard) across N
worker processes — per-query compares are independent reads of the same
parquet, so this is embarrassingly parallel; a few restatements are
wall-heavy at sf0.1 (q_dedup_cc_verified ~70 min single-threaded), which is
why the serial sweep took hours.

Expected exceptions are ASSERTED, not eyeballed: the fenced
```json expected-exceptions``` block in ORACLES.md pins, per SF, the exact
(spark_rows, oracle_rows) shape of every row that is ALLOWED to mismatch
(today: q_dedup_simhash's measured h=4 radius misses). A pinned row that
mismatches with exactly the pinned counts reports `expected_exception` and
does not fail the gate; one that PASSES, or mismatches with different
counts, reports `exception_drift` and FAILS — a different miss count is a
regression, not the knob (ORACLES.md round-15 note).

Output: a markdown gate table on stdout (paste into SCALE.md) plus one
merged JSON file (--out, default <verifyOutDir>/parallel_oracle.json).
Exit 0 iff nothing failed.
"""
import argparse
import json
import multiprocessing
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import check_oracle  # noqa: E402

_worker_con = None
_worker_args = None


def _init(sf_dir, out_dir, oracle):
    global _worker_con, _worker_args
    _worker_con = check_oracle.connect(sf_dir)
    _worker_args = (out_dir, oracle)


def _run(name):
    out_dir, oracle = _worker_args
    t0 = time.time()
    if name not in oracle:
        r = dict(query=name, status="no_oracle", spark_rows=0,
                 oracle_rows=0, note="")
    else:
        try:
            r = check_oracle.compare_query(_worker_con, out_dir, name,
                                           oracle[name])
        except Exception as e:  # a crashed compare must not kill the sweep
            r = dict(query=name, status="oracle_error", spark_rows=0,
                     oracle_rows=0, note=str(e)[:300])
    r["secs"] = round(time.time() - t0, 1)
    return r


def load_exceptions(oracles_md, sf_key):
    """The ```json expected-exceptions``` block of ORACLES.md for this SF:
    {query: {"rows": [spark_rows, oracle_rows]}}."""
    if not os.path.exists(oracles_md):
        return {}
    text = open(oracles_md).read()
    m = re.search(r"```json expected-exceptions\n(.*?)```", text, re.S)
    if not m:
        return {}
    return json.loads(m.group(1)).get(sf_key, {})


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir")
    ap.add_argument("out_dir")
    ap.add_argument("queries", nargs="*",
                    help="restrict to these queries (default: all dumped)")
    ap.add_argument("-j", type=int, default=max(os.cpu_count() // 3, 4),
                    help="worker processes")
    ap.add_argument("--out", default=None, help="merged JSON path")
    ap.add_argument("--oracles-md",
                    default=os.path.join(os.path.dirname(
                        os.path.dirname(os.path.abspath(__file__))),
                        "ORACLES.md"))
    ap.add_argument("--run-verify", action="store_true",
                    help="run the engine dump (sbt runMain graft.Verify) "
                         "first, failing the gate on any swallowed "
                         "per-query failure")
    args = ap.parse_args()

    engine_wall = None
    engine_failed = []
    if args.run_verify:
        import subprocess
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        t_eng = time.time()
        # forward an explicit query selection to the engine dump too
        # (Verify accepts trailing query names) — a selective gate run
        # must not pay a full-inventory engine sweep at large SFs
        sel = " " + " ".join(args.queries) if args.queries else ""
        proc = subprocess.run(
            ["sbt", "-batch",
             f"runMain graft.Verify {args.sf_dir} {args.out_dir}{sel}"],
            cwd=repo, capture_output=True, text=True)
        engine_wall = round(time.time() - t_eng, 1)
        # Verify swallows per-query failures (prints "[verify] <q> failed:"
        # and still writes the rest) — they MUST fail the gate here
        engine_failed = sorted(set(
            re.findall(r"\[verify\] (\S+) failed:",
                       proc.stdout + proc.stderr)))
        print(f"engine dump: {engine_wall}s, rc={proc.returncode}, "
              f"{len(engine_failed)} swallowed failures", flush=True)
        if proc.returncode != 0:
            sys.stderr.write(proc.stdout[-3000:] + proc.stderr[-3000:])
            sys.exit(2)

    oracle = json.load(open(os.path.join(args.out_dir, "oracle_sql.json")))
    dumped = sorted(n for n in os.listdir(args.out_dir)
                    if os.path.isdir(os.path.join(args.out_dir, n)))
    names = [n for n in dumped if not args.queries or n in args.queries]
    sf_key = os.path.basename(os.path.normpath(args.sf_dir))
    exceptions = load_exceptions(args.oracles_md, sf_key)

    results = {}
    t0 = time.time()
    with multiprocessing.Pool(
            args.j, initializer=_init,
            initargs=(args.sf_dir, args.out_dir, oracle)) as pool:
        for r in pool.imap_unordered(_run, names):
            results[r["query"]] = r
            done = len(results)
            print(f"[{done}/{len(names)}] {r['query']:32s} {r['status']:18s}"
                  f" {r['secs']}s", flush=True)

    # engine-side failures OVERRIDE whatever the compare saw: a query
    # Verify failed on has no trustworthy output — any compare result is
    # a stale dump from a previous run (an 'ok' or even a pinned
    # 'expected_exception' shape on stale bytes must still fail the gate)
    for q in engine_failed:
        if q not in names:
            names.append(q)
        results[q] = dict(query=q, status="engine_failed",
                          spark_rows=0, oracle_rows=0, secs=0.0,
                          note="swallowed [verify] failure - any compare "
                               "result was a stale dump")

    # fold the pinned exceptions into final statuses
    n_ok = n_exc = n_skip = 0
    fails = []
    for name in names:
        r = results[name]
        pin = exceptions.get(name)
        if pin is not None:
            want = tuple(pin["rows"])
            got = (r["spark_rows"], r["oracle_rows"])
            if r["status"] == "mismatch" and got == want:
                r["status"] = "expected_exception"
                r["note"] = f"pinned rows {want[0]}/{want[1]}: {pin.get('why', '')}"
                n_exc += 1
            else:
                # capture the OBSERVED status before overwriting it — "the
                # pin started passing" vs "regressed differently" is the
                # one fact the triage needs
                prev = r["status"]
                r["status"] = "exception_drift"
                r["note"] = (f"pinned rows {want[0]}/{want[1]} but got "
                             f"{prev}={got} - a different shape on a "
                             "pinned row is a regression")
                fails.append(name)
        elif r["status"] == "ok":
            n_ok += 1
        elif r["status"] == "no_oracle":
            # dumped but oracle-less (rows-only check upstream) — a no-op
            # here, same as the serial check_oracle sweep
            n_skip += 1
        else:
            fails.append(name)

    # the SCALE.md gate table: failures and exceptions in full, passes as
    # one summary row (201 OK lines say less than one count)
    eng = f" engine {engine_wall}s |" if engine_wall is not None else ""
    print(f"\n| sf | queries | ok | expected_exception | no_oracle | failed |{eng}")
    print(f"|---|---|---|---|---|---|")
    print(f"| {sf_key} | {len(names)} | {n_ok} | {n_exc} | {n_skip} "
          f"| {len(fails)} |")
    if n_exc or fails:
        print(f"\n| query | status | rows spark/oracle | note |")
        print(f"|---|---|---|---|")
        for name in names:
            r = results[name]
            if r["status"] in ("ok", "no_oracle"):
                continue
            print(f"| {name} | {r['status']} | "
                  f"{r['spark_rows']}/{r['oracle_rows']} | {r['note']} |")

    out_path = args.out or os.path.join(args.out_dir, "parallel_oracle.json")
    json.dump(dict(sf=sf_key, n_queries=len(names), n_ok=n_ok,
                   n_expected_exception=n_exc, n_no_oracle=n_skip,
                   n_failed=len(fails),
                   wall_secs=round(time.time() - t0, 1),
                   engine_wall_secs=engine_wall,
                   results=[results[n] for n in names]),
              open(out_path, "w"), indent=1)
    print(f"\nwrote {out_path}  ({n_ok} ok, {n_exc} expected-exception, "
          f"{n_skip} no-oracle, {len(fails)} failed, "
          f"{round(time.time() - t0, 1)}s wall)")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
