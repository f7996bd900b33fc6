"""Engine-level tests: generation loop, chunked decode, EOS handling,
chat sessions with resident KV history, tokenizer round trips."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from llm_inference_tpu.config import (EngineConfig, GenerationConfig,
                                      tiny_llama)
from llm_inference_tpu.engine.engine import ChatSession, InferenceEngine
from llm_inference_tpu.engine.tokenizer import BPETokenizer
from llm_inference_tpu.models import llama
from llm_inference_tpu.ops import kvcache


@pytest.fixture(scope="module")
def cfg():
    return tiny_llama()


@pytest.fixture(scope="module")
def params(cfg):
    return llama.init_params(cfg, jax.random.PRNGKey(0))


@pytest.fixture(scope="module")
def engine(cfg, params):
    return InferenceEngine(
        cfg, params,
        engine_cfg=EngineConfig(max_seq_len=64, decode_chunk=4,
                                prefill_buckets=(8, 16, 32)))


def greedy_reference(cfg, params, prompt, steps, max_seq=64):
    """Token-by-token greedy loop straight on the model (no engine)."""
    cache = kvcache.init_cache(cfg.num_layers, 1, cfg.num_kv_heads, max_seq,
                               cfg.head_dim, jnp.bfloat16)
    ids = jnp.asarray([prompt], jnp.int32)
    pos = jnp.arange(len(prompt), dtype=jnp.int32)[None]
    logits, cache = llama.forward(cfg, params, ids, pos, cache)
    toks = [int(jnp.argmax(logits[0]))]
    for i in range(steps - 1):
        p = jnp.array([[len(prompt) + i]], jnp.int32)
        logits, cache = llama.forward(
            cfg, params, jnp.array([[toks[-1]]], jnp.int32), p, cache)
        toks.append(int(jnp.argmax(logits[0])))
    return toks


class TestGenerate:
    def test_greedy_matches_manual_loop(self, cfg, params, engine):
        prompt = [1, 17, 103, 42]
        gen = GenerationConfig(max_new_tokens=10, greedy=True,
                               eos_token_ids=())
        res = engine.generate([prompt], gen)[0]
        golden = greedy_reference(cfg, params, prompt, 10)
        assert res.token_ids == golden

    def test_chunk_size_invariance(self, cfg, params):
        """Decode chunking must not change greedy output."""
        prompt = [1, 5, 9]
        outs = []
        for chunk in (1, 3, 8):
            eng = InferenceEngine(
                cfg, params,
                engine_cfg=EngineConfig(max_seq_len=64, decode_chunk=chunk,
                                        prefill_buckets=(8,)))
            gen = GenerationConfig(max_new_tokens=9, greedy=True,
                                   eos_token_ids=())
            outs.append(eng.generate([prompt], gen)[0].token_ids)
        assert outs[0] == outs[1] == outs[2]

    def test_batch_generation(self, engine):
        gen = GenerationConfig(max_new_tokens=6, greedy=True,
                               eos_token_ids=())
        res = engine.generate([[1, 3, 7], [1, 200, 150, 90, 2]], gen)
        assert len(res) == 2
        assert all(len(r.token_ids) == 6 for r in res)
        # batch rows must match single-row runs (padding independence)
        solo = engine.generate([[1, 3, 7]], gen)[0]
        assert res[0].token_ids == solo.token_ids

    def test_eos_stops(self, cfg, params, engine):
        gen0 = GenerationConfig(max_new_tokens=8, greedy=True,
                                eos_token_ids=())
        full = engine.generate([[1, 11, 22]], gen0)[0]
        # use the 3rd generated token as "EOS" and re-run
        eos_tok = full.token_ids[2]
        gen1 = GenerationConfig(max_new_tokens=8, greedy=True,
                                eos_token_ids=(eos_tok,))
        res = engine.generate([[1, 11, 22]], gen1)[0]
        assert res.finished
        assert res.token_ids == full.token_ids[:2]

    def test_streaming_callback(self, engine):
        seen = []
        gen = GenerationConfig(max_new_tokens=5, greedy=True,
                               eos_token_ids=())
        res = engine.generate([[1, 2, 3]], gen,
                              stream=lambda row, tid, s: seen.append(tid))
        assert seen == res[0].token_ids

    def test_sampled_generation_reproducible(self, engine):
        gen = GenerationConfig(max_new_tokens=6, temperature=0.8, top_k=50,
                               seed=7, eos_token_ids=())
        a = engine.generate([[1, 9, 2]], gen)[0].token_ids
        b = engine.generate([[1, 9, 2]], gen)[0].token_ids
        assert a == b


class TestChatSession:
    def test_history_resident_matches_full_reprefill(self, cfg, params):
        """Round-2 logits with cache-resident history must equal a fresh
        prefill over the concatenated history."""
        eng = InferenceEngine(
            cfg, params,
            engine_cfg=EngineConfig(max_seq_len=64, decode_chunk=2,
                                    prefill_buckets=(4, 8, 16, 32)))
        # identity "template" and token prompts via a fake tokenizer
        class TokStub:
            def encode(self, text, add_bos=True):
                return [int(t) for t in text.split()]
            def decode(self, ids):
                return " ".join(map(str, ids))
            def decode_token(self, tid):
                return f"{tid} "
        eng.tokenizer = TokStub()
        sess = ChatSession(eng, template=lambda text, r: text)
        gen = GenerationConfig(max_new_tokens=4, greedy=True,
                               eos_token_ids=())
        r1 = sess.ask("1 5 9", gen)
        r2 = sess.ask("7 3", gen)
        ids1 = [int(t) for t in r1.split()]
        ids2 = [int(t) for t in r2.split()]

        # golden: full-history token-by-token greedy
        hist = [1, 5, 9]
        golden1 = greedy_reference(cfg, params, hist, 4)
        assert ids1 == golden1
        hist = hist + golden1 + [7, 3]
        golden2 = greedy_reference(cfg, params, hist, 4)
        assert ids2 == golden2


class TestTokenizer:
    @pytest.fixture(scope="class")
    def tok(self, tmp_path_factory):
        # synthesize a small vocab in the reference binary format
        vocab = {}
        tid = 0
        for t in ["<unk>", "<s>", "</s>"]:
            vocab[t.encode()] = (tid, 0.0); tid += 1
        for i in range(256):
            vocab[b"<0x%02X>" % i] = (tid, -1000.0); tid += 1
        # BPE can only merge pairs whose concatenation is in-vocab, so the
        # vocab must contain the intermediate pieces (as real SP vocabs do)
        pieces = ["▁", "a", "b", "c", "h", "e", "l", "o", "w", "r", "d",
                  "ab", "abc", "▁ab", "▁h", "▁he", "ll", "llo", "▁hello",
                  "▁w", "▁wo", "or", "orl", "orld", "▁world", "!"]
        for i, p in enumerate(pieces):
            vocab[p.encode()] = (tid, float(len(p))); tid += 1
        t = BPETokenizer(vocab, kv={"bos_token_id": "1",
                                    "eos_token_id": "2"})
        path = tmp_path_factory.mktemp("tok") / "vocab.bin"
        t.save_binary(str(path))
        return BPETokenizer.from_binary(str(path))

    def test_roundtrip(self, tok):
        for s in ["hello world!", "abc ab c", "x y z"]:
            assert tok.decode(tok.encode(s, add_bos=False)) == s

    def test_merges_prefer_longest_score(self, tok):
        ids = tok.encode("hello", add_bos=False)
        assert ids == [tok.token_to_id["▁hello"]]

    def test_byte_fallback(self, tok):
        ids = tok.encode("é", add_bos=False)  # not in vocab → utf-8 bytes
        assert tok.decode(ids) == "é"

    def test_bos(self, tok):
        assert tok.encode("a")[0] == 1

    def test_reference_vocab_file_if_present(self):
        import os
        path = "/root/reference/llama2-7b-tokenizer.bin"
        if not os.path.exists(path):
            pytest.skip("reference tokenizer artifact not present")
        t = BPETokenizer.from_binary(path)
        assert t.vocab_size == 32000
        # HF-verified ids for llama-2
        assert t.encode("Hello, world!") == [1, 15043, 29892, 3186, 29991]
        s = "The quick brown fox."
        assert t.decode(t.encode(s, add_bos=False)) == s


class TestChunkedPrefill:
    def test_long_prompt_chunks_match_single_shot(self):
        """A prompt longer than every bucket runs as chunked prefill and
        must produce the same logits + decode behavior as a single forward
        over the whole prompt."""
        import numpy as np
        from llm_inference_tpu.config import EngineConfig, GenerationConfig
        from llm_inference_tpu.ops import kvcache as kvc

        cfg = tiny_llama(num_kv_heads=2)
        params = llama.init_params(cfg, jax.random.PRNGKey(0))
        eng = InferenceEngine(
            cfg, params,
            engine_cfg=EngineConfig(max_seq_len=64, decode_chunk=2,
                                    prefill_buckets=(8,)))   # chunk = 8
        rng = np.random.default_rng(0)
        prompts = [list(rng.integers(2, 200, 21)),   # 3 chunks (8+8+5)
                   list(rng.integers(2, 200, 6))]    # ends in chunk 1
        logits, cache = eng.prefill([list(p) for p in prompts])

        # golden: one unchunked forward per prompt
        for i, p in enumerate(prompts):
            c0 = kvc.init_cache(cfg.num_layers, 1, cfg.num_kv_heads, 64,
                                cfg.head_dim, jnp.bfloat16)
            ids = jnp.asarray([p], jnp.int32)
            pos = jnp.arange(len(p), dtype=jnp.int32)[None]
            want, _ = llama.forward(cfg, params, ids, pos, c0)
            np.testing.assert_allclose(np.asarray(logits[i]),
                                       np.asarray(want[0]),
                                       atol=2e-2, rtol=2e-2)

        # end-to-end: generate with the chunked path = generate with big
        # buckets (single-shot prefill)
        gen = GenerationConfig(greedy=True, max_new_tokens=5,
                               eos_token_ids=(1,))
        got = [r.token_ids for r in eng.generate(
            [list(p) for p in prompts], gen)]
        eng2 = InferenceEngine(
            cfg, params,
            engine_cfg=EngineConfig(max_seq_len=64, decode_chunk=2,
                                    prefill_buckets=(32,)))
        want = [r.token_ids for r in eng2.generate(
            [list(p) for p in prompts], gen)]
        assert got == want

    def test_small_cache_chunked_prefill(self):
        """Chunked prefill into a caller-provided SMALL cache (scheduler
        admission sizes caches at the prompt, not max_seq_len): every
        bucket-rounded write window must stay inside the cache extent.
        Regression for the clamp-and-overwrite bug: a 20-token prompt with
        buckets (8, 16) into a 20-slot cache put the last window at
        [16, 24), whose start clamped to 12 and overwrote committed KV."""
        import numpy as np
        from llm_inference_tpu.config import EngineConfig

        cfg = tiny_llama(num_kv_heads=2)
        params = llama.init_params(cfg, jax.random.PRNGKey(0))
        eng = InferenceEngine(
            cfg, params,
            engine_cfg=EngineConfig(max_seq_len=64, decode_chunk=2,
                                    prefill_buckets=(8, 16)))
        rng = np.random.default_rng(1)
        prompt = list(rng.integers(2, 200, 20))      # > largest bucket
        # prefill_cache_len rounds the LAST chunk's window up: 16 + 8 = 24
        assert eng.prefill_cache_len(20) == 24
        assert eng.prefill_cache_len(16) == 16
        assert eng.prefill_cache_len(63) == 64       # capped at max_seq_len
        small = eng.new_cache(1, max_seq=eng.prefill_cache_len(20))
        lg_small, _ = eng.prefill([list(prompt)], cache=small)
        lg_full, _ = eng.prefill([list(prompt)])
        np.testing.assert_allclose(np.asarray(lg_small), np.asarray(lg_full),
                                   atol=1e-5, rtol=1e-5)
        # a cache too small for the prompt raises instead of clamping
        with pytest.raises(ValueError, match="cache extent"):
            eng.prefill([list(prompt)], cache=eng.new_cache(1, max_seq=16))


class TestChatTemplate:
    def test_consecutive_user_messages_not_dropped(self):
        from llm_inference_tpu.engine.engine import format_chat_messages
        out = format_chat_messages([
            {"role": "user", "content": "A"},
            {"role": "user", "content": "B"},
        ])
        assert "A" in out and "B" in out

    def test_system_and_history(self):
        from llm_inference_tpu.engine.engine import format_chat_messages
        out = format_chat_messages([
            {"role": "system", "content": "S"},
            {"role": "user", "content": "U1"},
            {"role": "assistant", "content": "A1"},
            {"role": "user", "content": "U2"},
        ])
        assert out.startswith("[INST] <<SYS>>\nS\n<</SYS>>")
        assert "U1 [/INST] A1" in out and out.endswith("[INST] U2 [/INST]")


class TestStaticPathPenalties:
    """GenerationConfig min_p / penalties through the STATIC-knob decode
    programs (engine.generate / ChatSession — the CLI path)."""

    def _engine(self):
        cfg = tiny_llama(num_kv_heads=2)
        params = llama.init_params(cfg, jax.random.PRNGKey(0))
        return InferenceEngine(
            cfg, params,
            engine_cfg=EngineConfig(max_seq_len=64, decode_chunk=4,
                                    prefill_buckets=(8, 16)))

    def test_generate_presence_penalty_forbids_repeats(self):
        eng = self._engine()
        base = eng.generate([[5, 6, 7]],
                            GenerationConfig(greedy=True, max_new_tokens=12,
                                             eos_token_ids=()))[0].token_ids
        assert len(set(base)) < len(base)      # tiny model loops
        out = eng.generate([[5, 6, 7]],
                           GenerationConfig(greedy=True, max_new_tokens=12,
                                            eos_token_ids=(),
                                            presence_penalty=1000.0)
                           )[0].token_ids
        assert len(set(out)) == len(out)
        assert out[0] == base[0]

    def test_generate_repetition_penalty_covers_prompt(self):
        eng = self._engine()
        prompt = [5, 6, 7, 8]
        out = eng.generate([prompt],
                           GenerationConfig(greedy=True, max_new_tokens=10,
                                            eos_token_ids=(),
                                            repetition_penalty=1e6,
                                            presence_penalty=1000.0)
                           )[0].token_ids
        assert not (set(out) & set(prompt))

    def test_generate_min_p_near_one_is_greedy(self):
        eng = self._engine()
        want = eng.generate([[9, 10, 11]],
                            GenerationConfig(greedy=True, max_new_tokens=8,
                                             eos_token_ids=()))[0].token_ids
        got = eng.generate([[9, 10, 11]],
                           GenerationConfig(temperature=1.0, min_p=0.999,
                                            max_new_tokens=8,
                                            eos_token_ids=()))[0].token_ids
        assert got == want

    def test_chat_session_penalties(self):
        eng = self._engine()

        class TokStub:
            def encode(self, text, add_bos=True):
                return [int(t) for t in text.split()]
            def decode(self, ids):
                return " ".join(map(str, ids))
            def decode_token(self, tid):
                return f"{tid} "
        eng.tokenizer = TokStub()
        sess = ChatSession(eng, template=lambda text, r: text)
        gen = GenerationConfig(greedy=True, max_new_tokens=8,
                               eos_token_ids=(), presence_penalty=1000.0)
        out = [int(t) for t in sess.ask("5 6 7", gen).split()]
        assert len(set(out)) == len(out)


class TestScore:
    """engine.score — per-token prompt logprobs (OpenAI echo / scoring)."""

    def _oracle(self, cfg, params, toks):
        cache = kvcache.init_cache(cfg.num_layers, 1, cfg.num_kv_heads, 64,
                                   cfg.head_dim, jnp.bfloat16)
        ids = jnp.asarray([toks], jnp.int32)
        pos = jnp.arange(len(toks), dtype=jnp.int32)[None]
        logits, _ = llama.forward(cfg, params, ids, pos, cache,
                                  logits_mode="all")
        lp = jax.nn.log_softmax(np.asarray(logits, np.float32), axis=-1)
        return [float(lp[0, t, toks[t + 1]]) for t in range(len(toks) - 1)]

    def test_matches_full_forward(self, cfg, params, engine):
        toks = [3, 7, 11, 5, 2, 9]
        got = engine.score([toks])[0]
        want = self._oracle(cfg, params, toks)
        assert got[0] is None and len(got) == len(toks)
        np.testing.assert_allclose(got[1:], want, rtol=2e-3, atol=2e-3)

    def test_chunked_matches_single(self, cfg, params, engine):
        """A prompt longer than the largest bucket (32) chunks through the
        cache and must agree with the one-shot oracle."""
        rng = np.random.default_rng(3)
        toks = [int(t) for t in rng.integers(3, 200, 40)]
        got = engine.score([toks])[0]
        want = self._oracle(cfg, params, toks)
        np.testing.assert_allclose(got[1:], want, rtol=2e-3, atol=2e-3)

    def test_batch_rows_independent(self, cfg, params, engine):
        a, b = [5, 6, 7, 8], [9, 10, 11]
        both = engine.score([a, b])
        solo_a = engine.score([a])[0]
        solo_b = engine.score([b])[0]
        np.testing.assert_allclose(both[0][1:], solo_a[1:], atol=1e-5)
        np.testing.assert_allclose(both[1][1:], solo_b[1:], atol=1e-5)
        assert len(both[1]) == len(b)

    def test_consistent_with_decode_logprobs(self, cfg, params, engine):
        """score() of prompt+generated must reproduce the logprobs the
        decode path reported for the generated tokens."""
        gen = GenerationConfig(greedy=True, max_new_tokens=4,
                               eos_token_ids=())
        prompt = [3, 4, 5]
        from llm_inference_tpu.engine.scheduler import (
            ContinuousBatchingScheduler)
        sched = ContinuousBatchingScheduler(engine, gen, slots=2)
        r = sched.submit(prompt)
        while sched.step():
            pass
        full = prompt + r.output_ids
        sc = engine.score([full])[0]
        np.testing.assert_allclose(sc[len(prompt):], r.output_logprobs,
                                   rtol=2e-3, atol=2e-3)

    def test_empty_prompt_scores_empty(self, cfg, params, engine):
        out = engine.score([[], [5, 6, 7]])
        assert out[0] == []
        assert len(out[1]) == 3

    def test_odd_max_seq_len_chunk_cap(self, cfg, params):
        """max_seq_len not a multiple of the chunk: the last chunk's
        bucket must be capped, not clamp-corrupt committed KV."""
        eng = InferenceEngine(
            cfg, params,
            engine_cfg=EngineConfig(max_seq_len=20, decode_chunk=4,
                                    prefill_buckets=(8, 16)))
        rng = np.random.default_rng(5)
        toks = [int(t) for t in rng.integers(3, 200, 20)]  # 16 + 4 chunk
        got = eng.score([toks])[0]
        big = InferenceEngine(
            cfg, params,
            engine_cfg=EngineConfig(max_seq_len=64, decode_chunk=4,
                                    prefill_buckets=(32,)))
        want = big.score([toks])[0]
        np.testing.assert_allclose(got[1:], want[1:], rtol=2e-3, atol=2e-3)


class TestChatTemplates:
    def test_family_template_selection(self):
        from llm_inference_tpu.engine.engine import (
            chat_template_for, llama2_chat_template, llama3_chat_template,
            chatml_chat_template, gemma_chat_template)
        assert chat_template_for("llama2-7b") is llama2_chat_template
        assert chat_template_for("mistral-7b") is llama2_chat_template
        assert chat_template_for("llama3-8b") is llama3_chat_template
        assert chat_template_for("llama3.1-8b") is llama3_chat_template
        assert chat_template_for("qwen2-7b") is chatml_chat_template
        assert chat_template_for("gemma2-2b") is gemma_chat_template

    def test_format_chat_llama3(self):
        from llm_inference_tpu.engine.engine import format_chat_messages
        out = format_chat_messages(
            [{"role": "system", "content": "be brief"},
             {"role": "user", "content": "hi"}], "llama3-8b")
        assert "<|start_header_id|>system<|end_header_id|>\n\nbe brief" \
            in out
        assert out.endswith(
            "<|start_header_id|>assistant<|end_header_id|>\n\n")

    def test_format_chat_chatml(self):
        from llm_inference_tpu.engine.engine import format_chat_messages
        out = format_chat_messages(
            [{"role": "user", "content": "hi"},
             {"role": "assistant", "content": "hello"},
             {"role": "user", "content": "more"}], "qwen2-7b")
        assert out.count("<|im_start|>") == 4      # 3 turns + open
        assert out.endswith("<|im_start|>assistant\n")

    def test_format_chat_gemma_folds_system(self):
        from llm_inference_tpu.engine.engine import format_chat_messages
        out = format_chat_messages(
            [{"role": "system", "content": "rules"},
             {"role": "user", "content": "hi"}], "gemma2-2b")
        assert "<start_of_turn>user\nrules\n\nhi<end_of_turn>" in out
        assert "system" not in out                 # gemma has no sys role
        assert out.endswith("<start_of_turn>model\n")

    def test_format_chat_default_llama2_unchanged(self):
        from llm_inference_tpu.engine.engine import format_chat_messages
        a = format_chat_messages([{"role": "user", "content": "hi"}])
        b = format_chat_messages([{"role": "user", "content": "hi"}],
                                 "llama2-7b")
        assert a == b and "[INST]" in a


class TestEmbed:
    def test_last_pooling_matches_forward(self, cfg, params, engine):
        """embed('last') equals the L2-normalized final-norm hidden state
        at the prompt's last position from a direct forward."""
        toks = [3, 7, 11, 5]
        got = np.asarray(engine.embed([toks])[0])
        cache = kvcache.init_cache(cfg.num_layers, 1, cfg.num_kv_heads, 8,
                                   cfg.head_dim, jnp.bfloat16)
        ids = jnp.zeros((1, 8), jnp.int32).at[0, :4].set(jnp.asarray(toks))
        pos = jnp.arange(8, dtype=jnp.int32)[None]
        h, _ = llama.forward(cfg, params, ids, pos, cache,
                             logits_mode="hidden")
        want = np.asarray(h, np.float32)[0, 3]
        want = want / np.linalg.norm(want)
        np.testing.assert_allclose(got, want, atol=2e-3, rtol=2e-3)
        assert abs(np.linalg.norm(got) - 1.0) < 1e-5

    def test_mean_pool_ignores_padding(self, engine):
        """The same prompt batched with a longer one (forcing pad) must
        embed identically to a solo run — mean pooling masks padding."""
        a = [5, 6, 7]
        solo = np.asarray(engine.embed([a], pooling="mean")[0])
        both = engine.embed([a, list(range(3, 17))], pooling="mean")
        np.testing.assert_allclose(np.asarray(both[0]), solo, atol=2e-3,
                                   rtol=2e-3)

    def test_bad_inputs(self, engine):
        with pytest.raises(ValueError, match="pooling"):
            engine.embed([[1, 2]], pooling="max")
        with pytest.raises(ValueError, match="empty"):
            engine.embed([[]])

    def test_phi3_template(self):
        from llm_inference_tpu.engine.engine import (chat_template_for,
                                                     phi3_chat_template,
                                                     format_chat_messages)
        assert chat_template_for("phi3-mini") is phi3_chat_template
        out = format_chat_messages([{"role": "user", "content": "hi"}],
                                   "phi3-mini")
        assert out == "<|user|>\nhi<|end|>\n<|assistant|>\n"
