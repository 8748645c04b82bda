"""Compare two call_mods output TSVs row-by-row (docs/PARITY.md step 4).

Usage: python scripts/compare_calls.py ref_calls.tsv our_calls.tsv [tol]

Rows are keyed on (chrom, pos, strand, readname) so file order does not
matter; asserts identical key sets, prob_0/prob_1 within ``tol`` (default
1e-5), and identical called_label + k_mer.  Exit 0 on match.
"""

import sys


def load(path):
    rows = {}
    n = 0
    with open(path) as f:
        for line in f:
            w = line.rstrip("\n").split("\t")
            if len(w) != 10:
                raise ValueError(f"{path}: expected 10 columns, got {len(w)}")
            rows[(w[0], w[1], w[2], w[4])] = (float(w[6]), float(w[7]),
                                              w[8], w[9])
            n += 1
    if n != len(rows):
        raise ValueError(f"{path}: {n - len(rows)} duplicate "
                         "(chrom,pos,strand,readname) rows")
    return rows


def main(argv):
    ref_path, our_path = argv[1], argv[2]
    tol = float(argv[3]) if len(argv) > 3 else 1e-5
    ref, ours = load(ref_path), load(our_path)
    if set(ref) != set(ours):
        only_ref = len(set(ref) - set(ours))
        only_ours = len(set(ours) - set(ref))
        print(f"MISMATCH: {only_ref} sites only in {ref_path}, "
              f"{only_ours} only in {our_path}")
        return 1
    max_dp = 0.0
    flips = 0
    for k, (p0, p1, label, kmer) in ref.items():
        q0, q1, qlabel, qkmer = ours[k]
        max_dp = max(max_dp, abs(p0 - q0), abs(p1 - q1))
        if label != qlabel:
            flips += 1
        if kmer != qkmer:
            print(f"MISMATCH: k_mer differs at {k}: {kmer} vs {qkmer}")
            return 1
    print(f"{len(ref)} sites compared: max |dprob| = {max_dp:.3g}, "
          f"{flips} label flips (tol {tol})")
    return 0 if (max_dp <= tol and flips == 0) else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv))
