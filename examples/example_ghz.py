"""GHZ state preparation + verification (the reference's functional demo).

Usage: python examples/example_ghz.py [--qubits 20]
"""

import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse

import numpy as np

from dqc_tpu.models.ghz import GHZ


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--qubits", type=int, default=20)
    args = ap.parse_args()

    m = GHZ(args.qubits)
    print(f"GHZ fidelity at {args.qubits} qubits: {m.fidelity():.9f}")
    dens = m.densities()
    ok = all(np.allclose(d, np.eye(2) / 2, atol=1e-5) for d in dens)
    print(f"all 1q reduced densities maximally mixed: {ok}")


if __name__ == "__main__":
    main()
