"""CNN roofline + lowering experiments (VERDICT r4 item #1).

The bf16 full-model batch is ~100 ms of which the inception CNN is ~80 ms
(docs/PERF.md).  This script answers, with serial-chained fetch-synced
measurements on real hardware:

1. Where the 80 ms goes: stem vs each stage (L=90/45/23 blocks).
2. Whether a stage is HBM-bound or MXU-shape-bound: each conv's matmul is
   skinny (N=48/64 out-channels vs the 128-lane MXU tile; K=32 for the mid
   convs), so the *shape-limited* MXU ceiling is far below the dense peak.
   We compare achieved time against BOTH the HBM bound (analytic bytes /
   measured ~280 GB/s) and the shape-limited MXU bound.
3. Whether alternative lowerings beat XLA's conv path for ONE block at
   L=90: NCW layout, tap-shifted explicit matmuls, block-diagonal merged
   mid convs, and an im2col mega-matmul that merges all three mid convs
   into one [B*L, 352] x [352, 160] dot (good MXU shape, more traffic).

Run on the TPU host: PYTHONPATH=. python scripts/exp_cnn.py [B]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

HBM_GBPS = 280e9   # measured effective streaming bandwidth (exp_peak.py)


def timed(fn, *args, n=6):
    """Serial-chained, fetch-synced ms/call (docs/PERF.md protocol)."""
    out = fn(*args)
    _ = float(jnp.sum(out[0] if isinstance(out, (tuple, list)) else out)
              .astype(jnp.float32))

    @jax.jit
    def chain(acc, *a):
        r = fn(a[0] + (acc * 1e-12).astype(a[0].dtype), *a[1:])
        r0 = r[0] if isinstance(r, (tuple, list)) else r
        return acc + r0.astype(jnp.float32).sum()

    acc = chain(jnp.float32(0.0), *args)
    _ = float(acc)
    t = time.perf_counter()
    for _i in range(n):
        acc = chain(acc, *args)
    _ = float(acc)
    return (time.perf_counter() - t) / n * 1e3


def conv(x, k, stride=1):
    return jax.lax.conv_general_dilated(
        x, k, (stride,), "SAME", dimension_numbers=("NWC", "WIO", "NWC"))


def make_block_params(rng, cin, t=16, dt=jnp.bfloat16):
    """Weights for one production-shaped inception block (BN folded into
    conv kernels — inference-time BN is an affine rescale, so folding
    preserves both FLOPs and traffic while keeping the probe simple)."""
    g = lambda *s: jnp.asarray(rng.normal(0, 0.05, s), dt)
    return dict(
        b1=g(1, cin, t * 3),
        b2=g(1, cin, t * 3),
        b3a=g(1, cin, t * 2), b3b=g(3, t * 2, t * 3),
        b4a=g(1, cin, t * 2), b4b=g(5, t * 2, t * 3),
        stem=g(1, cin, t * 3),
        b5a=g(1, cin, t * 2), b5b=g(3, t * 2, t * 4), b5c=g(1, t * 4, t * 3),
    )


def block_production(x, p):
    """Reference-shaped block with XLA convs (the shipped lowering)."""
    b1 = jax.nn.relu(conv(jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 1), (1, 1, 1), "SAME"), p["b1"]))
    b2 = jax.nn.relu(conv(x, p["b2"]))
    b3 = jax.nn.relu(conv(jax.nn.relu(conv(x, p["b3a"])), p["b3b"]))
    b4 = jax.nn.relu(conv(jax.nn.relu(conv(x, p["b4a"])), p["b4b"]))
    stem = conv(x, p["stem"])
    b5 = conv(jax.nn.relu(conv(jax.nn.relu(conv(x, p["b5a"])), p["b5b"])),
              p["b5c"])
    return jnp.concatenate([b1, b2, b3, b4, jax.nn.relu(stem + b5)], axis=-1)


def block_ncw(x_ncw, p):
    """Same block in NCW layout (channels in sublanes, positions in lanes)."""
    def c(x, k):
        return jax.lax.conv_general_dilated(
            x, k, (1,), "SAME", dimension_numbers=("NCW", "WIO", "NCW"))
    b1 = jax.nn.relu(c(jax.lax.reduce_window(
        x_ncw, -jnp.inf, jax.lax.max, (1, 1, 3), (1, 1, 1), "SAME"),
        p["b1"]))
    b2 = jax.nn.relu(c(x_ncw, p["b2"]))
    b3 = jax.nn.relu(c(jax.nn.relu(c(x_ncw, p["b3a"])), p["b3b"]))
    b4 = jax.nn.relu(c(jax.nn.relu(c(x_ncw, p["b4a"])), p["b4b"]))
    stem = c(x_ncw, p["stem"])
    b5 = c(jax.nn.relu(c(jax.nn.relu(c(x_ncw, p["b5a"])), p["b5b"])),
           p["b5c"])
    return jnp.concatenate([b1, b2, b3, b4, jax.nn.relu(stem + b5)], axis=1)


def block_tapdot(x, p):
    """k-tap convs as explicit shifted matmuls (x @ k[tap] accumulated)."""
    def tap_conv(h, k):
        taps = k.shape[0]
        half = taps // 2
        y = None
        for i in range(taps):
            s = i - half
            hs = jnp.roll(h, -s, axis=1)
            # SAME zero padding: zero the wrapped rows
            if s > 0:
                hs = hs.at[:, -s:, :].set(0)
            elif s < 0:
                hs = hs.at[:, :-s, :].set(0)
            d = hs @ k[i]
            y = d if y is None else y + d
        return y
    b1 = jax.nn.relu(jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 1), (1, 1, 1), "SAME") @ p["b1"][0])
    b2 = jax.nn.relu(x @ p["b2"][0])
    b3 = jax.nn.relu(tap_conv(jax.nn.relu(x @ p["b3a"][0]), p["b3b"]))
    b4 = jax.nn.relu(tap_conv(jax.nn.relu(x @ p["b4a"][0]), p["b4b"]))
    stem = x @ p["stem"][0]
    b5 = tap_conv(jax.nn.relu(x @ p["b5a"][0]), p["b5b"]) @ p["b5c"][0]
    return jnp.concatenate([b1, b2, b3, b4, jax.nn.relu(stem + b5)], axis=-1)


def block_blockdiag(x, p, dt=jnp.bfloat16):
    """Mid convs (1x3 32->48, 1x5 32->48, 1x3 32->64) merged into ONE
    block-diagonal 1x5 conv [5, 96, 160] on the concatenated mid inputs."""
    kbd = jnp.zeros((5, 96, 160), dt)
    kbd = kbd.at[1:4, 0:32, 0:48].set(p["b3b"])
    kbd = kbd.at[:, 32:64, 48:96].set(p["b4b"])
    kbd = kbd.at[1:4, 64:96, 96:160].set(p["b5b"])
    # mid inputs from one merged 1x1 (240 -> 96)
    wmid = jnp.concatenate([p["b3a"][0], p["b4a"][0], p["b5a"][0]], axis=1)
    mid = jax.nn.relu(x @ wmid)
    y = conv(mid, kbd)
    b3 = jax.nn.relu(y[..., 0:48])
    b4 = jax.nn.relu(y[..., 48:96])
    b5m = jax.nn.relu(y[..., 96:160])
    b1 = jax.nn.relu(conv(jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 1), (1, 1, 1), "SAME"), p["b1"]))
    b2 = jax.nn.relu(x @ p["b2"][0])
    stem = x @ p["stem"][0]
    b5 = b5m @ p["b5c"][0]
    return jnp.concatenate([b1, b2, b3, b4, jax.nn.relu(stem + b5)], axis=-1)


def block_im2col(x, p):
    """All three mid convs as ONE im2col matmul:
    [B, L, 3*32 + 5*32 + 3*32 = 352] @ [352, 160] — K=352/N=160 is a good
    MXU shape, at the cost of materializing the 352-wide gather."""
    wmid = jnp.concatenate([p["b3a"][0], p["b4a"][0], p["b5a"][0]], axis=1)
    mid = jax.nn.relu(x @ wmid)     # [B, L, 96]
    m3, m4, m5 = mid[..., :32], mid[..., 32:64], mid[..., 64:96]

    def shifts(h, taps):
        half = taps // 2
        outs = []
        for i in range(taps):
            s = i - half
            hs = jnp.roll(h, -s, axis=1)
            if s > 0:
                hs = hs.at[:, -s:, :].set(0)
            elif s < 0:
                hs = hs.at[:, :-s, :].set(0)
            outs.append(hs)
        return outs

    gather = jnp.concatenate(shifts(m3, 3) + shifts(m4, 5) + shifts(m5, 3),
                             axis=-1)                       # [B, L, 352]
    wbig = jnp.zeros((352, 160), x.dtype)
    wbig = wbig.at[0:96, 0:48].set(p["b3b"].reshape(96, 48))
    wbig = wbig.at[96:256, 48:96].set(p["b4b"].reshape(160, 48))
    wbig = wbig.at[256:352, 96:160].set(p["b5b"].reshape(96, 64))
    y = gather @ wbig
    b3, b4, b5m = (jax.nn.relu(y[..., :48]), jax.nn.relu(y[..., 48:96]),
                   jax.nn.relu(y[..., 96:160]))
    b1 = jax.nn.relu(conv(jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 1), (1, 1, 1), "SAME"), p["b1"]))
    b2 = jax.nn.relu(x @ p["b2"][0])
    stem = x @ p["stem"][0]
    b5 = b5m @ p["b5c"][0]
    return jnp.concatenate([b1, b2, b3, b4, jax.nn.relu(stem + b5)], axis=-1)


def analytic_block_bytes(B, L, cin=240, t=16, dtype_bytes=2):
    """HBM bytes for one block under two fusion models."""
    el = B * L * dtype_bytes
    # conv-boundary model: every conv reads its input + writes its output
    # once (BN/relu fused into the conv, same-LHS 1x1s merged by XLA's
    # dot-merger into one read of x).
    conv_boundary = el * (
        cin          # merged 1x1s read x once
        + (3 * t + 2 * t + 2 * t + 3 * t + 2 * t)   # their outputs written
        + cin + cin  # maxpool read + write
        + cin + 3 * t          # b1 conv read pool, write
        + 2 * t + 3 * t        # b3 mid read/write
        + 2 * t + 3 * t        # b4 mid
        + 2 * t + 4 * t        # b5 mid1
        + 4 * t + 3 * t        # b5 mid2
        + 3 * t + 3 * t + 3 * t  # residual add reads stem+b5, writes slice
        + 12 * t)    # concat writes for b1..b4 slices (b5 counted above)
    # ideal whole-block fusion: read x once, write the 240-ch concat once,
    # mid activations never leave VMEM.
    ideal = el * (cin + 15 * t)
    return conv_boundary, ideal


def main(B=16384):
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    print(f"B={B}, dtype=bf16, serial-chained fetch-synced", flush=True)

    # ---- per-stage timing of production-shaped blocks ----
    stage_ms = {}
    for L, n_blocks, tag in ((90, 3, "stage1"), (45, 5, "stage2"),
                             (23, 3, "stage3")):
        x = jnp.asarray(rng.normal(0, 1, (B, L, 240)), dt)
        p = make_block_params(rng, 240)
        ms = timed(lambda x: block_production(x, p), x)
        stage_ms[tag] = (ms, n_blocks, L)
        cb, ideal = analytic_block_bytes(B, L)
        print(f"{tag}: L={L} {ms:7.2f} ms/block x{n_blocks} "
              f"= {ms*n_blocks:7.1f} ms | HBM bound: conv-boundary "
              f"{cb/HBM_GBPS*1e3:6.2f} ms, ideal {ideal/HBM_GBPS*1e3:6.2f} "
              f"ms | achieved {cb/(ms/1e3)/1e9:6.0f} GB/s (conv-boundary "
              f"bytes)", flush=True)
    total = sum(ms * n for ms, n, _ in stage_ms.values())
    print(f"reconstructed 11-block time: {total:.1f} ms", flush=True)

    # ---- lowering variants on ONE block at L=90 ----
    L = 90
    x = jnp.asarray(rng.normal(0, 1, (B, L, 240)), dt)
    x_ncw = jnp.transpose(x, (0, 2, 1))
    p = make_block_params(rng, 240)
    for name, fn, arg in (
            ("production NWC", lambda x: block_production(x, p), x),
            ("NCW layout", lambda x: block_ncw(x, p), x_ncw),
            ("tap-shifted dots", lambda x: block_tapdot(x, p), x),
            ("block-diag mids", lambda x: block_blockdiag(x, p), x),
            ("im2col mega-dot", lambda x: block_im2col(x, p), x)):
        try:
            ms = timed(fn, arg)
            print(f"variant {name:18s}: {ms:7.2f} ms/block", flush=True)
        except Exception as e:  # keep probing other variants
            print(f"variant {name:18s}: FAILED ({type(e).__name__}: "
                  f"{str(e)[:120]})", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 16384)
