"""Inspect a DIA-MS dataset: shapes, intensity stats, pair mixtures.

Script-form of /root/reference/nbs/test_data_loader.ipynb +
data_exploration.ipynb: load either backend, print shape/stat summaries,
render a few mixture peakmaps.

Usage:
  python examples/explore_dataset.py --parquet DIR            [--plots OUT]
  python examples/explore_dataset.py --npy MS2.npy MS1.npy    [--plots OUT]
"""

import argparse

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--parquet", default=None)
    ap.add_argument("--npy", nargs=2, default=None, metavar=("MS2", "MS1"))
    ap.add_argument("--plots", default=None)
    ap.add_argument("--pairs", type=int, default=3)
    args = ap.parse_args()

    from dquartic_tpu.data import DIAMSDataset, PairBatches

    if args.npy:
        ds = DIAMSDataset(ms2_file=args.npy[0], ms1_file=args.npy[1], normalize="minmax")
    elif args.parquet:
        ds = DIAMSDataset(parquet_directory=args.parquet, normalize="minmax")
    else:
        ap.error("provide --parquet or --npy")

    print(f"dataset: {len(ds)} samples ({ds.data_type} backend)")
    ms2_1, ms1_1, ms2_2, ms1_2 = ds.sample_pair()
    print(f"MS2 window shape: {ms2_1.shape}  MS1 shape: {ms1_1.shape}")
    for name, arr in [("ms2_1", ms2_1), ("ms1_1", ms1_1)]:
        nz = (arr > 0).mean()
        print(
            f"{name}: min={arr.min():.4g} max={arr.max():.4g} "
            f"mean={arr.mean():.4g} nonzero={nz * 100:.1f}%"
        )

    batches = PairBatches(ds, batch_size=2)
    batch = next(iter(batches))
    print("batch keys:", {k: v.shape for k, v in batch.items()})

    if args.plots:
        from dquartic_tpu.utils.viz import _peakmap

        import os

        os.makedirs(args.plots, exist_ok=True)
        for i in range(args.pairs):
            a, _, b, _ = ds.sample_pair()
            _peakmap(0.5 * a + 0.5 * b, f"Mixture {i}", f"{args.plots}/mixture_{i}.png")
        print(f"wrote {args.pairs} mixture peakmaps to {args.plots}")


if __name__ == "__main__":
    main()
