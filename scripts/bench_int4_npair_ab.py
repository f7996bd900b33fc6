"""Chip A/B: int4 N-pair difference-of-dots layout vs the plain K-split
blocked layout (the CLAUDE.md queue item).

Builds the LLaMA-2-7B INT4(g=128) quantized params ONCE, then lays them out
both ways and measures marginal decode tok/s for each. The npair layout
packs both nibbles of a byte against the SAME x element, so the hi-nibble
dot is (dot(x, bytes) - dot(x, lo))/16 — no floor/mul hi extraction on the
VPU (the plain kernel is VPU-bound at ~64-69%% of the HBM roofline).

Run: env PYTHONPATH=/root/.axon_site:/root/repo python scripts/bench_int4_npair_ab.py
"""
import sys
import time

import numpy as np

HBM_BW = 819e9  # v5e


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def measure(cfg, params, tag, *, steps_a=32, steps_b=160, prompt_len=128,
            seq_len=512):
    import jax
    import jax.numpy as jnp
    from llm_inference_tpu.models import llama
    from llm_inference_tpu.ops import kvcache

    cache = kvcache.init_cache(cfg.num_layers, 1, cfg.num_kv_heads,
                               seq_len, cfg.head_dim, "int8")

    def decode_n(params, cache, token, pos0, steps):
        def body(carry, _):
            cache, token, pos = carry
            logits, cache = llama.forward(cfg, params, token[:, None],
                                          pos[:, None], cache)
            nxt = jnp.argmax(logits, -1).astype(jnp.int32)
            return (cache, nxt, pos + 1), nxt
        (cache, token, pos), toks = jax.lax.scan(
            body, (cache, token, pos0), None, length=steps)
        return toks, cache

    token0 = jnp.ones((1,), jnp.int32)
    pos0 = jnp.full((1,), prompt_len, jnp.int32)
    times = {}
    first_tokens = None
    for steps in (steps_a, steps_b):
        fn = jax.jit(lambda p, c, t, q, s=steps: decode_n(p, c, t, q, s),
                     donate_argnums=(1,))
        t0 = time.time()
        toks, cache2 = fn(params, cache, token0, pos0)
        np.asarray(toks[-1])
        log(f"[npair_ab:{tag}] decode[{steps}] compile+run "
            f"{time.time()-t0:.1f}s")
        del cache2
        cache = kvcache.init_cache(cfg.num_layers, 1, cfg.num_kv_heads,
                                   seq_len, cfg.head_dim, "int8")
        best = float("inf")
        for _ in range(3):
            toks = None
            t0 = time.perf_counter()
            toks, cache2 = fn(params, cache, token0, pos0)
            got = np.asarray(toks[:8, 0])
            best = min(best, time.perf_counter() - t0)
            del cache2
            cache = kvcache.init_cache(cfg.num_layers, 1,
                                       cfg.num_kv_heads, seq_len,
                                       cfg.head_dim, "int8")
        if first_tokens is None:
            first_tokens = got
        times[steps] = best
        log(f"[npair_ab:{tag}] decode {steps} steps: {best*1e3:.1f} ms")
    dt = (times[steps_b] - times[steps_a]) / (steps_b - steps_a)
    tok_s = 1.0 / dt
    wbytes = sum(np.prod(x.shape) * x.dtype.itemsize
                 for x in jax.tree.leaves(params))
    kv_mean = prompt_len + (steps_a + steps_b) // 2
    kv_bytes = cfg.num_layers * cfg.num_kv_heads * kv_mean * cfg.head_dim * 2
    roofline = HBM_BW / (wbytes + kv_bytes)
    log(f"[npair_ab:{tag}] marginal {dt*1e3:.2f} ms/token → {tok_s:.1f} "
        f"tok/s ({tok_s/roofline*100:.1f}% of {roofline:.1f} roofline)")
    return tok_s, first_tokens


def run_one(layout: str):
    """One layout per PROCESS: the relay backend frees buffers lazily, so
    measuring both layouts in one process OOMs HBM on the second."""
    import jax
    from llm_inference_tpu.config import QuantConfig, llama2_7b
    from llm_inference_tpu.models import llama

    assert jax.default_backend() == "tpu", "run on the chip"
    cfg = llama2_7b()
    qcfg = QuantConfig(weights="int4", group_size=128,
                       quantize_embedding=True)
    t0 = time.time()
    raw = llama.init_params_quantized(cfg, jax.random.PRNGKey(0), qcfg)
    log(f"[npair_ab] quantized params built in {time.time()-t0:.1f}s")
    params = llama.prepare_params(raw, int4_npair=(layout == "npair"))
    tok_s, toks = measure(cfg, params, layout)
    print(repr({"layout": layout, "tok_s": tok_s,
                "tokens": toks.tolist()}))


def main():
    if len(sys.argv) > 1:
        run_one(sys.argv[1])
        return
    import ast
    import subprocess
    out = {}
    for layout in ("plain", "npair"):
        r = subprocess.run([sys.executable, __file__, layout],
                           capture_output=True, text=True)
        sys.stderr.write(r.stderr)
        if r.returncode != 0:
            log(f"[npair_ab] {layout} run failed rc={r.returncode}")
            sys.exit(1)
        out[layout] = ast.literal_eval(r.stdout.strip().splitlines()[-1])
    same = out["plain"]["tokens"] == out["npair"]["tokens"]
    log(f"[npair_ab] greedy tokens identical across layouts: {same}")
    win = out["npair"]["tok_s"] / out["plain"]["tok_s"]
    log(f"[npair_ab] npair/plain = {win:.3f}x "
        f"({out['plain']['tok_s']:.1f} → {out['npair']['tok_s']:.1f} tok/s)")
    sys.exit(0 if same else 1)


if __name__ == "__main__":
    main()
