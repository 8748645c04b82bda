"""Wire-format experiments through the tunnel: 5 separate arrays vs one
packed buffer; main-thread vs background-thread h2d; output fetch cost."""
import threading
import time
import queue as queue_mod

import jax
import jax.numpy as jnp
import numpy as np

B, K, S = 512, 17, 360
N_BATCH = 6
ITERS = 12


def make_batches(n):
    rng = np.random.default_rng(0)
    return [dict(
        kmer=rng.integers(0, 4, (B, K)).astype(np.int32),
        means=rng.normal(0, 1, (B, K)).astype(np.float32),
        stds=np.abs(rng.normal(0, 1, (B, K))).astype(np.float32),
        sanums=rng.integers(1, 40, (B, K)).astype(np.float32),
        signals=rng.normal(0, 1, (B, S)).astype(np.float32)) for _ in range(n)]


def pack(b):
    """One contiguous f32 buffer [B, 4K+S]: kmer(asf32)|means|stds|sanums|signals."""
    return np.concatenate([b["kmer"].astype(np.float32), b["means"],
                           b["stds"], b["sanums"], b["signals"]], axis=1)


def t_ms(fn, n=ITERS):
    jax.block_until_ready(fn())
    t = time.perf_counter()
    outs = [fn() for _ in range(n)]
    jax.block_until_ready(outs)
    return (time.perf_counter() - t) / n * 1e3


def main():
    print("platform:", jax.default_backend(), flush=True)
    batches = make_batches(N_BATCH)
    packed = [pack(b) for b in batches]
    i = [0]

    def put5():
        i[0] += 1
        b = batches[i[0] % N_BATCH]
        return jax.device_put((b["kmer"], b["means"], b["stds"], b["sanums"],
                               b["signals"]))

    def put1():
        i[0] += 1
        return jax.device_put(packed[i[0] % N_BATCH])

    print(f"h2d 5 arrays (875KB): {t_ms(put5):7.2f} ms", flush=True)
    print(f"h2d packed   (899KB): {t_ms(put1):7.2f} ms", flush=True)

    # background-thread h2d while main thread sleeps (does transfer use a
    # separate stream that can progress while the main thread is busy?)
    out_q = queue_mod.Queue()

    def worker():
        while True:
            item = out_q.get()
            if item is None:
                break
            item[1].append(jax.device_put(packed[item[0] % N_BATCH]))

    res = []
    th = threading.Thread(target=worker)
    th.start()
    t = time.perf_counter()
    for j in range(ITERS):
        out_q.put((j, res))
    out_q.put(None)
    th.join()
    jax.block_until_ready(res)
    print(f"h2d packed via 1 bg thread: {(time.perf_counter()-t)/ITERS*1e3:7.2f} ms/batch", flush=True)

    # 4 threads, split batches between them
    qs = [queue_mod.Queue() for _ in range(4)]
    res = [[] for _ in range(4)]

    def worker4(k):
        while True:
            item = qs[k].get()
            if item is None:
                break
            res[k].append(jax.device_put(packed[item % N_BATCH]))

    ths = [threading.Thread(target=worker4, args=(k,)) for k in range(4)]
    for th in ths:
        th.start()
    t = time.perf_counter()
    for j in range(ITERS):
        qs[j % 4].put(j)
    for q in qs:
        q.put(None)
    for th in ths:
        th.join()
    jax.block_until_ready(res)
    print(f"h2d packed via 4 threads:  {(time.perf_counter()-t)/ITERS*1e3:7.2f} ms/batch", flush=True)

    # d2h: typical result fetch ([B,2] f32 + [B] i32)
    a = jax.device_put((np.zeros((B, 2), np.float32), np.zeros(B, np.int32)))
    print(f"d2h results (~6KB): {t_ms(lambda: jax.device_get(a)):7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
