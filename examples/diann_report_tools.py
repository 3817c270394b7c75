"""DIA-NN report utilities.

Script-form of the framework-relevant parts of
/root/reference/nbs/DIA-NN_to_MassDASH_FeatureExtraction.ipynb:
convert DIA-NN parquet outputs to TSV (the MassDASH input format),
FDR-filter identifications, and summarize identifications per run.
The notebook's MassDASH/cuDF feature-extraction cells drive external
vendor tooling and are out of scope here.

Usage:
  python examples/diann_report_tools.py summarize report.parquet [--qvalue 0.01]
  python examples/diann_report_tools.py to-tsv report.parquet report.tsv
"""

import argparse


def main():
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)

    s = sub.add_parser("summarize", help="FDR-filtered identifications per run")
    s.add_argument("report")
    s.add_argument("--qvalue", type=float, default=0.01)

    t = sub.add_parser("to-tsv", help="parquet -> TSV for MassDASH")
    t.add_argument("input")
    t.add_argument("output")

    args = ap.parse_args()
    import pandas as pd

    if args.cmd == "to-tsv":
        df = pd.read_parquet(args.input)
        df.to_csv(args.output, sep="\t", index=False)
        print(f"Converted {args.input} ({len(df)} rows) -> {args.output}")
        return

    df = pd.read_parquet(args.report)
    filtered = df[df["Q.Value"] < args.qvalue] if "Q.Value" in df else df
    print(f"{len(filtered)}/{len(df)} identifications at Q < {args.qvalue}")
    if "Run" in filtered:
        counts = filtered.groupby("Run").size().reset_index(name="Identifications")
        print(counts.to_string(index=False))
    if {"Modified.Sequence", "Precursor.Charge"} <= set(filtered.columns):
        uniq = filtered[["Modified.Sequence", "Precursor.Charge"]].drop_duplicates()
        print(f"Unique peptide-charge pairs: {len(uniq)}")


if __name__ == "__main__":
    main()
