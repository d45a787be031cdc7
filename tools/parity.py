"""Parity harness (component C15, SURVEY.md §4.2.4).

Compares two runs' artifacts — {output WAV, DOA CSV} — by output-sample SNR
and circular DOA error.  Assumes nothing about the producer beyond the
artifact format, so the same tool compares mcax-vs-oracle today and
mcax-vs-reference-binaries the moment reference outputs exist
(/root/reference was empty at build time; SURVEY.md §0).

    python tools/parity.py --wav a.wav b.wav --snr-db 40
    python tools/parity.py --doa a.csv b.csv --max-deg 2
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import sys

import numpy as np


def wav_snr_db(path_a: str, path_b: str, skip: int = 0) -> float:
    from mcax.io.wav import read_wav
    _, a = read_wav(path_a)
    _, b = read_wav(path_b)
    n = min(a.shape[-1], b.shape[-1])
    a, b = a[..., skip:n].astype(np.float64), b[..., skip:n].astype(np.float64)
    err = ((a - b) ** 2).sum()
    sig = (a ** 2).sum()
    return float("inf") if err == 0 else 10.0 * np.log10(sig / err)


def doa_error_deg(path_a: str, path_b: str) -> float:
    """Median circular |error| in degrees between two DOA CSVs
    (block,frame_or_source,doa_deg,score rows; joined on the first 2 cols)."""
    def load(p):
        rows = {}
        with open(p) as f:
            header = f.readline()
            assert "doa_deg" in header, f"{p}: not a DOA csv"
            for line in f:
                parts = line.strip().split(",")
                rows[(int(parts[0]), int(parts[1]))] = float(parts[2])
        return rows
    a, b = load(path_a), load(path_b)
    common = sorted(set(a) & set(b))
    if not common:
        raise ValueError("no overlapping (block, frame) keys")
    d = np.asarray([a[k] - b[k] for k in common])
    d = np.abs((d + 180.0) % 360.0 - 180.0)
    return float(np.median(d))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--wav", nargs=2, metavar=("A", "B"))
    ap.add_argument("--doa", nargs=2, metavar=("A", "B"))
    ap.add_argument("--snr-db", type=float, default=40.0,
                    help="minimum acceptable output SNR")
    ap.add_argument("--max-deg", type=float, default=2.0,
                    help="maximum acceptable median DOA error")
    ap.add_argument("--skip", type=int, default=0,
                    help="samples to skip (filter warmup)")
    args = ap.parse_args(argv)
    ok = True
    if args.wav:
        snr = wav_snr_db(args.wav[0], args.wav[1], args.skip)
        passed = snr >= args.snr_db
        ok &= passed
        print(f"wav SNR: {snr:.1f} dB (bound {args.snr_db}) "
              f"{'PASS' if passed else 'FAIL'}")
    if args.doa:
        err = doa_error_deg(args.doa[0], args.doa[1])
        passed = err <= args.max_deg
        ok &= passed
        print(f"DOA median error: {err:.2f} deg (bound {args.max_deg}) "
              f"{'PASS' if passed else 'FAIL'}")
    if not (args.wav or args.doa):
        ap.error("nothing to compare")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
