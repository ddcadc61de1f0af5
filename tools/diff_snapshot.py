#!/usr/bin/env python3
"""Snapshot drift tripwire (round-16, verdict item #8).

Diffs the working-tree `verify_out_snapshot/` against the version last
COMMITTED to git and prints, per query: ADDED (new gate), REMOVED
(gate deleted), or CHANGED (output values drifted). A CHANGED row on a
query whose code did not change this round is the tripwire for
twin-and-code co-edits that keep the driver hash green while silently
moving values — exactly the class a hash-only gate cannot see.

Usage: python3 tools/diff_snapshot.py [repo_root]
Exit 0 always (reporting tool, not a gate); the round log quotes it.
"""
import subprocess, sys, os

def main(root="/root/repo"):
    snap = os.path.join(root, "verify_out_snapshot")
    if not os.path.isdir(snap):
        print("no verify_out_snapshot/ in working tree")
        return 0
    committed = set(subprocess.run(
        ["git", "-C", root, "ls-tree", "-r", "--name-only", "HEAD",
         "verify_out_snapshot"],
        capture_output=True, text=True).stdout.split())
    committed = {os.path.basename(p) for p in committed if p.endswith(".json")}
    working = {f for f in os.listdir(snap) if f.endswith(".json")}
    added = sorted(working - committed)
    removed = sorted(committed - working)
    changed = []
    for f in sorted(working & committed):
        old = subprocess.run(
            ["git", "-C", root, "show", f"HEAD:verify_out_snapshot/{f}"],
            capture_output=True, text=True).stdout
        with open(os.path.join(snap, f)) as fh:
            new = fh.read()
        if old != new:
            # count differing lines for the report
            ol, nl = old.splitlines(), new.splitlines()
            ndiff = sum(1 for a, b in zip(ol, nl) if a != b) + \
                abs(len(ol) - len(nl))
            changed.append((f[:-5], ndiff, len(ol), len(nl)))
    if added:
        print(f"ADDED ({len(added)}): " +
              ", ".join(a[:-5] for a in added))
    if removed:
        print(f"REMOVED ({len(removed)}): " +
              ", ".join(r[:-5] for r in removed))
    if changed:
        print(f"CHANGED ({len(changed)}) — value drift on existing gates; "
              "verify each is an INTENDED semantic change:")
        for name, nd, no, nn in changed:
            print(f"  {name}: {nd} differing lines (rows {no} -> {nn})")
    if not (added or removed or changed):
        print("snapshot identical to last commit — no value drift")
    else:
        print(f"\n{len(added)} added, {len(removed)} removed, "
              f"{len(changed)} changed (of {len(working)} snapshots)")
    return 0

if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:]))
