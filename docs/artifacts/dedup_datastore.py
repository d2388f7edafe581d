"""Dedup a datastore's recorder files after a dual-writer incident.

Keeps the LAST occurrence of each step in every step-keyed recorder file
(CSV: first column `step`; JSONL: `step` field). Rationale in
rec13anchor4_incident_0731.md: when two resumed processes interleave
rows, the process that carries the run forward writes each overlapping
step LATER, so keep-last yields a single-lineage curve.

Refuses to run while the run's pidfile points at a live process (an
append-mode writer holds the inode; rewriting under it loses rows).

Usage: python docs/artifacts/dedup_datastore.py runs/rec13anchor4
"""
import argparse
import json
import os
import sys

CSVS = ("generator.csv", "learning.csv", "disc_learning.csv",
        "disc_param_stats.csv")
JSONLS = ("learning.jsonl", "tc_mean.jsonl")


def dedup_lines(lines, key_of):
    """Keep the last line per key, preserving the order of last sightings."""
    last = {}
    for i, ln in enumerate(lines):
        last[key_of(ln)] = i
    keep = sorted(last.values())
    return [lines[i] for i in keep], len(lines) - len(keep)


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("datastore")
    ap.add_argument("--pidfile", default=None,
                    help="refuse if this pidfile's process is alive "
                         "(default /tmp/<basename>.pid)")
    args = ap.parse_args()
    run = args.datastore.rstrip("/")
    pidfile = args.pidfile or f"/tmp/{os.path.basename(run)}.pid"
    if os.path.exists(pidfile):
        try:
            pid = int(open(pidfile).read().strip())
            os.kill(pid, 0)
            sys.exit(f"refusing: {pidfile} -> live pid {pid} "
                     "(stop the run first)")
        except (ValueError, ProcessLookupError, PermissionError):
            pass

    total = 0
    for name in CSVS:
        path = os.path.join(run, name)
        if not os.path.exists(path):
            continue
        with open(path) as f:
            header = f.readline()
            rows = f.readlines()
        deduped, dropped = dedup_lines(
            rows, lambda ln: ln.split(",", 1)[0])
        if dropped:
            tmp = path + ".dedup"
            with open(tmp, "w") as f:
                f.write(header)
                f.writelines(deduped)
            os.replace(tmp, path)
        print(f"{name}: dropped {dropped} duplicate-step rows")
        total += dropped

    for name in JSONLS:
        path = os.path.join(run, name)
        if not os.path.exists(path):
            continue
        with open(path) as f:
            rows = f.readlines()

        # Drop torn lines outright (interleaved/truncated writes from the
        # dual-writer window are garbage, not data), then dedup by step.
        parsed, torn = [], 0
        for ln in rows:
            try:
                parsed.append((json.loads(ln).get("step"), ln))
            except json.JSONDecodeError:
                torn += 1
        kept, dropped = dedup_lines(parsed, lambda p: p[0])
        deduped = [ln for _, ln in kept]
        dropped += torn
        if dropped:
            tmp = path + ".dedup"
            with open(tmp, "w") as f:
                f.writelines(deduped)
            os.replace(tmp, path)
        print(f"{name}: dropped {dropped} duplicate-step rows")
        total += dropped
    print(f"total dropped: {total}")


if __name__ == "__main__":
    main()
