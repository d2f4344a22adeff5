"""Multi-instance aggregate throughput scaling on ONE chip (VERDICT item 6):
1/2/4/8 instances, aggregate scans/s and per-instance efficiency.
PYTHONPATH=/root/.axon_site:/root/repo."""


def main():
    import bench

    r1 = bench.bench_single(n_scans=120)
    single = r1["value"]
    print(f"batch=1  {single:7.1f} scans/s  (ate {r1['ate_m']})", flush=True)
    for b in (2, 4, 8):
        r = bench.bench_batch(batch=b, n_scans=40)
        agg = r["value"]
        eff = agg / (single * b)
        print(f"batch={b}  {agg:7.1f} scans/s aggregate  "
              f"({agg / b:6.1f}/instance, efficiency {eff:.2f})", flush=True)


if __name__ == "__main__":
    main()
