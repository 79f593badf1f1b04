"""Host numpy vs on-device k-mer counting (SURVEY §7.10 / VERDICT item:
'put k-mer counting on device or retract the claim'). Prints both rates
so PERF.md can state the measured tradeoff."""
import sys, time
sys.path.insert(0, '/root/repo')
import numpy as np


def main():
    import jax
    from unicycler_tpu.asm.correct import pack_kmers, canonical_packed
    from unicycler_tpu.ops.kmer_count import count_canonical_device
    rng = np.random.default_rng(0)
    k = 21
    n_reads, read_len = 100_000, 100
    reads = [rng.integers(0, 4, read_len).astype(np.int8)
             for _ in range(n_reads)]
    t0 = time.time()
    chunks = []
    for codes in reads:
        km, valid = pack_kmers(codes, k)
        chunks.append(canonical_packed(km[valid], k))
    t_pack = time.time() - t0
    total = sum(len(c) for c in chunks)

    t0 = time.time()
    allk = np.concatenate(chunks)
    uniq_h, counts_h = np.unique(allk, return_counts=True)
    t_host = time.time() - t0

    # device (includes upload + fetch, the tunnelled reality)
    count_canonical_device(chunks[:64], k)           # warm-up compile
    t0 = time.time()
    uniq_d, counts_d = count_canonical_device(chunks, k)
    t_dev = time.time() - t0
    same = np.array_equal(uniq_h, uniq_d) and np.array_equal(
        counts_h, counts_d.astype(counts_h.dtype))
    print({'kmers': total, 'pack_s': round(t_pack, 2),
           'host_unique_s': round(t_host, 2),
           'device_sortreduce_s': round(t_dev, 2),
           'parity': bool(same),
           'platform': jax.devices()[0].platform})


if __name__ == '__main__':
    main()
