"""Interactive chat REPL — equivalent of the reference's user_entry.cpp
(reference: user_entry.cpp:13-53: multi-round stdin loop, streaming token
callback, "exit" to quit), plus dummy-weight and quantization flags.

Usage:
  python -m llm_inference_tpu.cli --model tiny            # dummy weights
  python -m llm_inference_tpu.cli --model llama2-7b \
      --checkpoint /path/to/hf_dir --tokenizer /path/to/tokenizer.bin \
      --quant int8
"""

from __future__ import annotations

import argparse
import jax
import jax.numpy as jnp


def build_engine(args):
    from llm_inference_tpu import config as C
    from llm_inference_tpu.engine import InferenceEngine, load_tokenizer
    from llm_inference_tpu.models import llama
    from llm_inference_tpu.utils import checkpoint

    from llm_inference_tpu.models import registry

    if args.checkpoint:
        with open(f"{args.checkpoint}/config.json") as f:
            import json as _json
            cfg = checkpoint.model_config_from_hf(_json.load(f))
    else:
        preset = C.PRESETS.get(args.model, C.tiny_llama)
        cfg = preset()

    # validate BEFORE materializing weights (an 8x7B dummy build is minutes)
    is_llama = registry.get_model(cfg.name) is llama
    is_moe = cfg.num_experts > 0
    if args.tp > 1:
        from llm_inference_tpu.parallel.sharding import validate_tp
        try:
            validate_tp(cfg, args.tp)   # MoE: expert divisibility (EP axis)
        except ValueError as e:
            raise SystemExit(str(e))
    model_mod = registry.get_model(cfg.name)
    quantize_fn = getattr(model_mod, "quantize_params",
                          llama.quantize_params)

    if args.checkpoint:
        cfg, params = checkpoint.load_hf_checkpoint(args.checkpoint,
                                                    dtype=args.dtype)
    else:
        print(f"[cli] no checkpoint given — dummy weights for {cfg.name} "
              f"(the reference CLI does the same, user_entry.cpp:21)")
        params = registry.get_model(cfg.name).init_params(
            cfg, jax.random.PRNGKey(0), dtype=args.dtype)
    if args.tp > 1 and not is_moe:
        # MoE shards whole expert stacks (no TP dim split) — no padding
        params = llama.pad_params_for_tp(params, cfg, args.tp)
    if args.quant != "none":
        qcfg = C.QuantConfig(weights=args.quant, group_size=args.group_size,
                             asymmetric=getattr(args, "asym", False))
        if is_moe:
            # --tp names the EXPERT axis for MoE: lay the quantized expert
            # stacks out expert-block-major so axis-0 sharding is per-expert
            params = quantize_fn(params, qcfg, ep_shards=args.tp)
        else:
            params = quantize_fn(params, qcfg, row_shards=args.tp)
    npair = getattr(args, "int4_npair", None)
    if npair and (not is_llama or args.tp > 1 or args.quant != "int4"):
        # explicit --int4-npair: refuse rather than silently lay out the
        # plain split-half path — an A/B "with npair on" must never measure
        # the wrong layout. (Default None = auto: npair when eligible.)
        raise SystemExit("--int4-npair requires --quant int4, tp=1, and a "
                         "llama-family model")
    if is_llama:
        # fuse + streaming re-layout: the llama kernel path's contract
        params = llama.prepare_params(
            params, tp_size=args.tp,
            int4_npair=npair is not False)
    elif args.quant != "none":
        # gemma2/mixtral keep raw layer keys (no qkv fusion) but still need
        # the column-blocked streaming layout for the Pallas quant matmul —
        # without it every projection falls back to the slow XLA dequant.
        # tp_size aligns block widths to shard-local dims (block_params);
        # MoE weights are never dim-split, so blocks stay full-width.
        # Families with their own layout (deepseek's two stacks) provide
        # their own prepare_params.
        prep = getattr(model_mod, "prepare_params", None)
        if prep is not None:
            params = prep(params, tp_size=args.tp)
        else:
            params = llama.prepare_params(
                params, tp_size=1 if is_moe else args.tp, fuse=False)

    adapter_names = None
    if getattr(args, "lora", None):
        # multi-LoRA serving: --lora name=peft_dir (repeatable); requests
        # pick adapters by name (scheduler `adapter=`, /v1 model routing)
        from llm_inference_tpu.models import lora as lora_mod
        names, adapters, scalings = [], [], []
        for spec in args.lora:
            name, _, path = spec.partition("=")
            if not path:
                raise SystemExit(f"--lora expects name=path, got {spec!r}")
            ad, sc = lora_mod.load_peft_adapter(cfg, path)
            names.append(name)
            adapters.append(ad)
            scalings.append(sc)
        params = dict(params)
        params["lora"] = lora_mod.stack_adapters(cfg, adapters,
                                                 scaling=scalings)
        adapter_names = names

    tokenizer = load_tokenizer(args.tokenizer) if args.tokenizer else None
    mesh = None
    if args.tp > 1 or args.dp > 1:
        from llm_inference_tpu.parallel import make_mesh
        mesh = make_mesh(C.ShardingConfig(data=args.dp, tensor=args.tp))
    eng_cfg = C.EngineConfig(max_seq_len=args.max_seq_len,
                             decode_chunk=args.decode_chunk)
    cache_dtype = (args.kv_cache if args.kv_cache in ("int8", "int4")
                   else jnp.bfloat16)
    return InferenceEngine(cfg, params, engine_cfg=eng_cfg,
                           tokenizer=tokenizer, mesh=mesh,
                           cache_dtype=cache_dtype,
                           adapter_names=adapter_names)


def main(argv=None):
    ap = argparse.ArgumentParser(description="TPU-native LLM chat")
    ap.add_argument("--model", default="tiny")
    ap.add_argument("--checkpoint", default=None,
                    help="HF safetensors dir (else dummy weights)")
    ap.add_argument("--tokenizer", default=None,
                    help="tokenizer.json / reference .bin vocab")
    ap.add_argument("--dtype", default=None)
    ap.add_argument("--quant", default="none",
                    choices=["none", "int8", "int4"])
    ap.add_argument("--group-size", type=int, default=0)
    ap.add_argument("--int4-npair", action="store_true", default=None,
                    help="require the N-pair int4 layout (difference-of-"
                         "dots unpack; single-chip llama-family only). "
                         "Default: auto — used whenever eligible")
    ap.add_argument("--no-int4-npair", dest="int4_npair",
                    action="store_false",
                    help="force the plain split-half int4 layout")
    ap.add_argument("--asym", action="store_true",
                    help="asymmetric (min/max, zero-point) weight quantization")
    ap.add_argument("--kv-cache", default="bf16",
                    choices=["bf16", "int8", "int4"])
    ap.add_argument("--lora", action="append", default=None,
                    metavar="NAME=PEFT_DIR",
                    help="load a LoRA adapter for multi-LoRA serving "
                         "(repeatable)")
    ap.add_argument("--tp", type=int, default=1)
    ap.add_argument("--dp", type=int, default=1)
    ap.add_argument("--max-seq-len", type=int, default=2048)
    ap.add_argument("--decode-chunk", type=int, default=8)
    ap.add_argument("--max-new-tokens", type=int, default=256)
    ap.add_argument("--temperature", type=float, default=1.0)
    ap.add_argument("--top-k", type=int, default=0)
    ap.add_argument("--top-p", type=float, default=1.0)
    ap.add_argument("--min-p", type=float, default=0.0)
    ap.add_argument("--repetition-penalty", type=float, default=1.0)
    ap.add_argument("--presence-penalty", type=float, default=0.0)
    ap.add_argument("--frequency-penalty", type=float, default=0.0)
    ap.add_argument("--greedy", action="store_true")
    args = ap.parse_args(argv)

    from llm_inference_tpu.config import GenerationConfig
    from llm_inference_tpu.engine.engine import ChatSession

    engine = build_engine(args)
    gen = GenerationConfig(max_new_tokens=args.max_new_tokens,
                           temperature=args.temperature, top_k=args.top_k,
                           top_p=args.top_p, min_p=args.min_p,
                           repetition_penalty=args.repetition_penalty,
                           presence_penalty=args.presence_penalty,
                           frequency_penalty=args.frequency_penalty,
                           greedy=args.greedy)

    if engine.tokenizer is None:
        print("[cli] no tokenizer — echoing token ids for dummy runs")

    adapter = None
    session = ChatSession(engine)
    print("Ready. Type your message ('exit' to quit, 'reset' to clear "
          "history" + (", 'adapter <name|base>' to switch LoRA"
                       if engine.adapter_slots else "") + ").")
    while True:
        try:
            line = input("you> ").strip()
        except EOFError:
            break
        if not line:
            continue
        if line == "exit":
            break
        if line == "reset":
            session = ChatSession(engine, adapter=adapter)
            continue
        if line.startswith("adapter ") or line == "adapter":
            name = line[len("adapter"):].strip()
            want = None if name in ("", "base") else name
            try:
                engine.resolve_adapter(want)
            except ValueError as e:
                print(f"[cli] {e}")
                continue
            adapter = want
            # resident KV was produced under the old adapter — start fresh
            session = ChatSession(engine, adapter=adapter)
            print(f"[cli] adapter: {adapter or 'base'} (history reset)")
            continue
        if engine.tokenizer is None:
            # dummy mode: feed fixed ids, print sampled ids
            res = engine.generate([[1, 2, 3, 4]], gen, adapter=adapter)[0]
            print("ids>", res.token_ids)
            continue
        print("bot> ", end="", flush=True)
        session.ask(line, gen, stream=lambda s: print(s, end="", flush=True))
        print()
    print("bye.")


if __name__ == "__main__":
    main()
