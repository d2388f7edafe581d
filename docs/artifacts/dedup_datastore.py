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

# CSV name -> how many leading columns form the row's identity.
# disc_learning.csv records one row PER CRITIC ITERATION, so its key is
# (step, critic_iter) — keying on step alone would collapse the 5-6
# legitimate critic rows of every step into one.
CSVS = {"generator.csv": 1, "learning.csv": 1, "disc_learning.csv": 2,
        "disc_param_stats.csv": 1}
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
    for name, key_cols in CSVS.items():
        path = os.path.join(run, name)
        if not os.path.exists(path):
            continue
        with open(path) as f:
            header = f.readline()
            rows = f.readlines()
        # Drop torn rows BEFORE the keep-last dedup — a truncated fragment
        # from a killed writer ('41230,0.05') must not out-rank the later
        # complete row for the same step, or the gate/monitor float parse
        # breaks. A row is whole iff it has the header's column count and
        # every field parses as float.
        n_cols = len(header.rstrip("\n").split(","))

        def _whole(ln):
            fields = ln.rstrip("\n").split(",")
            if len(fields) != n_cols:
                return False
            try:
                # empty fields are legitimate (timing columns are only
                # filled every --timing-every steps) — but the step
                # column itself must parse
                float(fields[0])
                [float(x) for x in fields if x != ""]
            except ValueError:
                return False
            return True

        whole = [ln for ln in rows if _whole(ln)]
        torn = len(rows) - len(whole)
        deduped, dropped = dedup_lines(
            whole, lambda ln: tuple(ln.split(",")[:key_cols]))
        dropped += torn
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
        for i, ln in enumerate(rows):
            try:
                step = json.loads(ln).get("step")
            except json.JSONDecodeError:
                torn += 1
                continue
            # A step-less record is NOT a duplicate of every other
            # step-less record — key it by position so it survives.
            parsed.append((step if step is not None else ("nostep", i),
                           ln))
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
