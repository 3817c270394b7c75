"""Raw sqMass QA: isolation windows, spectra counts, RT/m-z coverage.

Script-form of /root/reference/nbs/hela_2018.ipynb's data QA cells.

Usage: python examples/inspect_sqmass.py RUN.sqMass [--iso-index 0]
"""

import argparse


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("sqmass")
    ap.add_argument("--iso-index", type=int, default=0)
    args = ap.parse_args()

    from dquartic_tpu.data.sqmass import SqMassLoader
    from dquartic_tpu.native import native_available

    print(f"native decoder: {'yes' if native_available() else 'no (python fallback)'}")
    loader = SqMassLoader(args.sqmass)
    loader.load_all_data()

    iso = loader.iso_win_info
    print(f"\nisolation windows: {len(iso)}")
    print(iso.to_string(index=False, max_rows=20))

    for level, df in [(1, loader.ms1_data), (2, loader.ms2_data)]:
        spectra = df["SPECTRUM_ID"].nunique()
        print(
            f"\nMS{level}: {spectra} spectra, {len(df)} points, "
            f"RT [{df['RETENTION_TIME'].min():.1f}, {df['RETENTION_TIME'].max():.1f}] s, "
            f"m/z [{df['mz'].min():.2f}, {df['mz'].max():.2f}]"
        )

    row = iso.iloc[args.iso_index]
    ms1 = loader.extract_ms1_slice(row, num_bins=50)
    ms2 = loader.extract_ms2_slice(row, num_bins=1000)
    print(
        f"\nslice for isolation target {row['ISOLATION_TARGET']:.2f}: "
        f"MS1 {len(ms1)} points / {ms1['mz'].nunique()} bins, "
        f"MS2 {len(ms2)} points / {ms2['mz'].nunique()} bins"
    )


if __name__ == "__main__":
    main()
