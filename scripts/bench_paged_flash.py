"""Chip A/B: prefix-cache suffix prefill via the paged-flash kernel vs the
dense gather fallback (the CLAUDE.md queue item).

Scenario: a 3968-token shared prefix is already resident in the page pool
(engine/prefix_cache.py hit); a 128-token suffix is prefilled on top with
forward(paged_history=True). The gather fallback materializes every
sequence's pages densely EVERY LAYER; the kernel streams history pages
once straight from the pool via page-table index maps.

Run: env PYTHONPATH=/root/.axon_site:/root/repo python scripts/bench_paged_flash.py
"""
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def run(cfg, params, cache0, ids, pos, *, force_gather, tag):
    import jax
    from llm_inference_tpu.models import llama
    from llm_inference_tpu.models.llama import pallas_paged_flash as PFL

    real_supports = PFL.supports
    if force_gather:
        PFL.supports = lambda *a, **kw: False
    try:
        fwd = jax.jit(lambda p, i, q, c: llama.forward(
            cfg, p, i, q, c, paged_history=True))
        t0 = time.time()
        logits, _ = fwd(params, ids, pos, cache0)
        logits.block_until_ready()
        log(f"[paged_flash:{tag}] compile+run {time.time()-t0:.1f}s")
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            logits, _ = fwd(params, ids, pos, cache0)
            np.asarray(logits[0, :8])
            best = min(best, time.perf_counter() - t0)
        log(f"[paged_flash:{tag}] suffix prefill best-of-5 {best*1e3:.1f} ms")
        return best, np.asarray(logits[0, :64], np.float32)
    finally:
        PFL.supports = real_supports


def main():
    import jax
    import jax.numpy as jnp
    from llm_inference_tpu.config import QuantConfig, llama2_7b
    from llm_inference_tpu.models import llama
    from llm_inference_tpu.ops import paged_kvcache as pk

    assert jax.default_backend() == "tpu", "chip bench"
    cfg = llama2_7b()
    params = llama.prepare_params(llama.init_params_quantized(
        cfg, jax.random.PRNGKey(0),
        QuantConfig(weights="int8", quantize_embedding=True)))
    log("[paged_flash] params ready")

    ps, hist_blocks, T = 128, 31, 128           # 3968 prefix + 128 suffix
    nb = hist_blocks + T // ps
    cache = pk.init_paged_cache(cfg.num_layers, nb + 1, cfg.num_kv_heads,
                                ps, cfg.head_dim, 1, nb, jnp.bfloat16)
    cache = cache.replace(
        page_table=(jnp.arange(nb, dtype=jnp.int32) + 1)[None])
    # fill the history pages with realistic values, all layers
    key = jax.random.PRNGKey(1)
    hist = hist_blocks * ps
    for layer in range(cfg.num_layers):
        kh = jax.random.normal(key, (hist, cfg.num_kv_heads, cfg.head_dim),
                               jnp.bfloat16)
        cache = pk.write_prompt(cache, jnp.int32(layer), 0, kh, kh)
    ids = jnp.ones((1, T), jnp.int32)
    pos = (hist + jnp.arange(T, dtype=jnp.int32))[None]

    t_kern, l_kern = run(cfg, params, cache, ids, pos,
                         force_gather=False, tag="kernel")
    t_gath, l_gath = run(cfg, params, cache, ids, pos,
                         force_gather=True, tag="gather")
    rel = (np.abs(l_kern - l_gath).max()
           / (np.abs(l_gath).max() + 1e-9))
    log(f"[paged_flash] logits rel diff {rel:.2e}")
    log(f"[paged_flash] kernel {t_kern*1e3:.1f} ms vs gather "
        f"{t_gath*1e3:.1f} ms → {t_gath/t_kern:.2f}x")


if __name__ == "__main__":
    main()
