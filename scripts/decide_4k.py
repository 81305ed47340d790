"""Parse a measure_4k_tilings.py log and print the playbook decision.

Usage: python scripts/decide_4k.py /tmp/measure_out.txt

Implements CLAUDE.md post-measurement playbook step 2 mechanically:
ranks (tiling, stats_mode) by measured ms/chain, checks the parity
lines, and prints the _AUTO_TILES / _pick_exact_tiles / default-mode
edits to make (or the measured-rejection note to record).
"""
import re
import sys


def main(path):
    text = open(path).read()
    rows = []          # (ms, mps, trs, tls, mode)
    rows8k = []
    parity = []        # (label, diff, ok)
    pat = re.compile(
        r"^(tiling|8K) (\((\d+|None), (\d+|None)\))\s+(\S+)\s*: "
        r"([\d.]+) ms/chain\s+(\d+) MP/s", re.M)
    for m in pat.finditer(text):
        kind, _, trs, tls, mode, ms, mps = m.groups()
        row = (float(ms), int(mps),
               None if trs == "None" else int(trs),
               None if tls == "None" else int(tls), mode)
        (rows8k if kind == "8K" else rows).append(row)
    for m in re.finditer(
            r"^parity (\(.*?\)) (\S+) vs default: max abs diff "
            r"([\d.]+) (OK|FAIL)", text, re.M):
        parity.append((m.group(1) + " " + m.group(2),
                       float(m.group(3)), m.group(4) == "OK"))
    fails = re.findall(r"^(?:tiling|8K|parity).*FAILED:.*$", text, re.M)

    if not rows:
        print("no 4K timing rows found in", path)
        return 1
    rows.sort()
    base = next((r for r in rows if r[2] is None and r[4] == "slots"),
                None)
    print("== 4K ranking (best first) ==")
    for ms, mps, trs, tls, mode in rows:
        tag = " <- BASE" if (trs is None and mode == "slots") else ""
        print("  %7.2f ms  %5d MP/s  (%s, %s) %s%s"
              % (ms, mps, trs, tls, mode, tag))
    if rows8k:
        rows8k.sort()
        print("== 8K ranking ==")
        for ms, mps, trs, tls, mode in rows8k:
            print("  %7.2f ms  %5d MP/s  (%s, %s) %s"
                  % (ms, mps, trs, tls, mode))
    print("== parity ==")
    bad_parity = [p for p in parity if not p[2]]
    for label, d, ok in parity:
        print("  %-28s %.4f %s" % (label, d, "OK" if ok else "FAIL"))
    if fails:
        print("== failed configs (check for compile errors) ==")
        for f in fails:
            print("  " + f[:160])

    best = rows[0]
    print("== decision ==")
    if bad_parity:
        print("PARITY FAILURE — do not flip anything; investigate "
              "first:", [p[0] for p in bad_parity])
        return 1
    if best[2] is None:
        print("Base (None, None) wins: record a measured-rejection "
              "note in CLAUDE.md with the numbers; keep "
              "_AUTO_TILES=False.")
        return 0
    margin = (base[0] - best[0]) / base[0] * 100 if base else float("nan")
    print("Winner: tiles (%s, %s) stats_mode=%r — %.2f ms vs base "
          "%.2f ms (%.1f%% faster)."
          % (best[2], best[3], best[4], best[0],
             base[0] if base else float("nan"), margin))
    print("Edits (guided_pallas.py):")
    print("  1. _AUTO_TILES = True")
    print("  2. _pick_exact_tiles: put th=%s first in the row order, "
          "tw=%s first in the lane order" % (best[2], best[3]))
    if best[4] != "slots":
        print("  3. default stats_mode=%r for the PADLESS branch only "
              "(keep slots for the padded path)" % best[4])
    print("Then: python bench.py --gate && python bench.py on chip; "
          "update README table + CLAUDE.md notes.")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1
                  else "/tmp/measure_out.txt"))
