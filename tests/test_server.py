"""HTTP serving front-end: real socket round trips against the threaded
scheduler backend (batch, streaming, health/metrics, error paths)."""

import json
import threading
import urllib.request

import numpy as np
import jax
import pytest

from llm_inference_tpu.config import (EngineConfig, GenerationConfig,
                                      tiny_llama)
from llm_inference_tpu.engine import server as srv
from llm_inference_tpu.engine.engine import InferenceEngine
from llm_inference_tpu.models import llama


@pytest.fixture(scope="module")
def httpd():
    cfg = tiny_llama(num_kv_heads=2)
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    engine = InferenceEngine(
        cfg, params,
        engine_cfg=EngineConfig(max_seq_len=64, decode_chunk=4,
                                max_batch_size=2, prefill_buckets=(8, 16)))
    httpd = srv.serve(engine, host="127.0.0.1", port=0,
                      gen=GenerationConfig(greedy=True, max_new_tokens=6,
                                           eos_token_ids=(1,)))
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield httpd
    httpd.shutdown()
    httpd.backend.shutdown()


def _url(httpd, path):
    return f"http://127.0.0.1:{httpd.server_address[1]}{path}"


def _post(httpd, obj, path="/generate"):
    req = urllib.request.Request(
        _url(httpd, path), data=json.dumps(obj).encode(),
        headers={"Content-Type": "application/json"})
    return urllib.request.urlopen(req, timeout=120)


class TestServer:
    def test_generate(self, httpd):
        with _post(httpd, {"prompt": [5, 6, 7], "max_new_tokens": 5}) as r:
            out = json.load(r)
        assert len(out["token_ids"]) <= 5 and out["ttft_s"] > 0

    def test_generate_matches_engine(self, httpd):
        eng = httpd.backend.engine
        want = eng.generate([[9, 10, 11]],
                            GenerationConfig(greedy=True, max_new_tokens=6,
                                             eos_token_ids=(1,)))[0].token_ids
        with _post(httpd, {"prompt": [9, 10, 11]}) as r:
            got = json.load(r)["token_ids"]
        assert got == want

    def test_concurrent_requests(self, httpd):
        rng = np.random.default_rng(0)
        prompts = [list(map(int, rng.integers(2, 200, 4))) for _ in range(6)]
        results = {}

        def one(i):
            with _post(httpd, {"prompt": prompts[i]}) as r:
                results[i] = json.load(r)
        ts = [threading.Thread(target=one, args=(i,))
              for i in range(len(prompts))]
        for t in ts:
            t.start()
        for t in ts:
            t.join(timeout=120)
        assert len(results) == len(prompts)
        # each concurrent result matches a solo run
        eng = httpd.backend.engine
        for i, p in enumerate(prompts):
            want = eng.generate([list(p)],
                                GenerationConfig(greedy=True,
                                                 max_new_tokens=6,
                                                 eos_token_ids=(1,))
                                )[0].token_ids
            assert results[i]["token_ids"] == want, i

    def test_streaming(self, httpd):
        with _post(httpd, {"prompt": [4, 5], "stream": True}) as r:
            lines = [json.loads(l) for l in r.read().splitlines()]
        assert lines[-1]["done"] is True
        assert all("token_id" in l for l in lines[:-1])

    def test_health_and_metrics(self, httpd):
        with urllib.request.urlopen(_url(httpd, "/health"), timeout=30) as r:
            h = json.load(r)
        assert h["status"] == "ok"
        with urllib.request.urlopen(_url(httpd, "/metrics"), timeout=30) as r:
            m = json.load(r)
        assert any(k.startswith("ttft_s") for k in m)

    def test_bad_request(self, httpd):
        try:
            _post(httpd, {"nope": 1})
            assert False, "expected 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400

    def test_oversized_prompt_rejected(self, httpd):
        try:
            _post(httpd, {"prompt": list(range(2, 200)),
                          "max_new_tokens": 5})
            assert False, "expected 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400


class TestOpenAICompat:
    """The /v1 endpoints speak the OpenAI API shape (SURVEY has no
    analogue — the reference has no server at all)."""

    def test_completions(self, httpd):
        with _post(httpd, {"prompt": [5, 6, 7], "max_tokens": 4},
                   path="/v1/completions") as r:
            out = json.loads(r.read())
        assert out["object"] == "text_completion"
        c = out["choices"][0]
        assert len(c["token_ids"]) == 4
        assert c["finish_reason"] in ("stop", "length")
        assert out["usage"]["total_tokens"] == 7

    def test_completions_matches_generate(self, httpd):
        with _post(httpd, {"prompt": [9, 10, 11], "max_new_tokens": 5}) as r:
            want = json.loads(r.read())["token_ids"]
        with _post(httpd, {"prompt": [9, 10, 11], "max_tokens": 5},
                   path="/v1/completions") as r:
            got = json.loads(r.read())["choices"][0]["token_ids"]
        assert got == want

    def test_chat_without_tokenizer_is_400(self, httpd):
        import urllib.error
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(httpd, {"messages": [{"role": "user", "content": "x"}]},
                  path="/v1/chat/completions")
        assert e.value.code == 400

    def test_oversized_is_400_openai_shape(self, httpd):
        import urllib.error
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(httpd, {"prompt": [5], "max_tokens": 4000},
                  path="/v1/completions")
        assert e.value.code == 400
        assert json.loads(e.value.read())["error"]["type"] == \
            "invalid_request_error"


class TestCancellation:
    def test_cancel_queued_request(self, httpd):
        b = httpd.backend
        # fill both slots + queue one more, then cancel the queued one
        reqs = [b.submit([5, 6, 7], 6) for _ in range(3)]
        assert b.cancel(reqs[2].req_id) in (True, False)
        for r in reqs[:2]:
            b.wait(r, timeout=120)
        b.wait(reqs[2], timeout=120)
        assert reqs[2].cancelled or len(reqs[2].output_ids) == 6

    def test_cancel_endpoint(self, httpd):
        import urllib.request
        req = httpd.backend.submit([9, 10, 11], 6)
        with _post(httpd, {"request_id": req.req_id}, path="/cancel") as r:
            out = json.loads(r.read())
        assert out["request_id"] == req.req_id
        httpd.backend.wait(req, timeout=120)

    def test_cancel_mid_generation_stops_early(self):
        """A running request flagged cancelled must retire at the next
        harvest with fewer tokens than its budget (and, paged, release its
        pages)."""
        from llm_inference_tpu.engine.scheduler import PagedScheduler
        cfg = tiny_llama(num_kv_heads=2)
        params = llama.init_params(cfg, jax.random.PRNGKey(0))
        engine = InferenceEngine(
            cfg, params,
            engine_cfg=EngineConfig(max_seq_len=64, decode_chunk=2,
                                    max_batch_size=2,
                                    prefill_buckets=(8, 16), page_size=8))
        sched = PagedScheduler(
            engine, GenerationConfig(greedy=True, max_new_tokens=30,
                                     eos_token_ids=()), slots=1)
        free0 = sched.alloc.free_pages
        req = sched.submit([5, 6, 7, 8])
        steps = 0
        while sched.step():
            steps += 1
            if steps == 3:
                sched.cancel(req)
        assert req.cancelled
        assert len(req.output_ids) < 30
        assert sched.alloc.free_pages == free0     # pages released


class TestStopTokensAndWarmup:
    def test_stop_token_ends_generation(self, httpd):
        b = httpd.backend
        # find the greedy stream first, then stop on its 3rd token
        ref = b.submit([7, 8, 9], 6)
        b.wait(ref, timeout=120)
        assert len(ref.output_ids) >= 3
        stop = ref.output_ids[2]
        req = b.submit([7, 8, 9], 6, stop_token_ids=[stop])
        b.wait(req, timeout=120)
        assert req.finished
        first = ref.output_ids.index(stop)     # stops at FIRST occurrence
        assert req.output_ids == ref.output_ids[:first + 1]
        # the stream must not have emitted the stop token — covered by
        # _emit's stop filtering; output_ids keeps it for the caller

    def test_warmup_compiles_buckets(self, httpd):
        from llm_inference_tpu.engine.server import warmup
        warmup(httpd.backend)      # must complete without error
        r = httpd.backend.submit([5, 6], 2)
        assert httpd.backend.wait(r, timeout=120)


class TestLogprobs:
    def test_logprobs_returned_and_consistent(self, httpd):
        with _post(httpd, {"prompt": [5, 6, 7], "max_new_tokens": 5,
                           "logprobs": True}) as r:
            out = json.loads(r.read())
        lps = out["token_logprobs"]
        assert len(lps) == len(out["token_ids"]) == 5
        assert all(lp <= 0.0 for lp in lps)     # log-probabilities

    def test_openai_logprobs_shape(self, httpd):
        with _post(httpd, {"prompt": [5, 6, 7], "max_tokens": 4,
                           "logprobs": 1}, path="/v1/completions") as r:
            out = json.loads(r.read())
        lp = out["choices"][0]["logprobs"]
        assert len(lp["token_logprobs"]) == len(lp["tokens"]) == 4


class TestProductionSamplingHTTP:
    """The new serving knobs ride the HTTP body end to end."""

    def test_seeded_sampling_reproducible(self, httpd):
        body = {"prompt": [3, 4, 5], "temperature": 2.0, "seed": 123,
                "max_new_tokens": 8}
        with _post(httpd, body) as r:
            a = json.load(r)["token_ids"]
        with _post(httpd, body) as r:
            b = json.load(r)["token_ids"]
        assert a == b
        with _post(httpd, {**body, "seed": 124}) as r:
            c = json.load(r)["token_ids"]
        assert c != a

    def test_penalties_and_min_p_accepted(self, httpd):
        with _post(httpd, {"prompt": [5, 6, 7], "max_new_tokens": 8,
                           "greedy": True,
                           "presence_penalty": 1000.0,
                           "repetition_penalty": 2.0,
                           "frequency_penalty": 0.1}) as r:
            out = json.load(r)["token_ids"]
        assert len(set(out)) == len(out)
        with _post(httpd, {"prompt": [5, 6, 7], "min_p": 0.5,
                           "temperature": 1.0, "max_new_tokens": 4}) as r:
            assert len(json.load(r)["token_ids"]) <= 4

    def test_bad_min_p_is_400(self, httpd):
        import urllib.error
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(httpd, {"prompt": [5, 6], "min_p": 1.5})
        assert e.value.code == 400


class TestTopLogprobsHTTP:
    def test_generate_top_logprobs(self, httpd):
        with _post(httpd, {"prompt": [5, 6, 7], "greedy": True,
                           "max_new_tokens": 4, "logprobs": True,
                           "top_logprobs": 3}) as r:
            out = json.load(r)
        assert len(out["top_logprobs"]) == len(out["token_ids"])
        first = out["top_logprobs"][0]
        assert len(first) == 3
        assert first[0]["token_id"] == out["token_ids"][0]

    def test_openai_logprobs_int(self, httpd):
        with _post(httpd, {"prompt": [5, 6, 7], "max_tokens": 4,
                           "logprobs": 2}, path="/v1/completions") as r:
            out = json.load(r)
        lp = out["choices"][0]["logprobs"]
        assert len(lp["tokens"]) == len(lp["token_logprobs"])
        assert all(len(d) == 2 for d in lp["top_logprobs"])


class TestNCompletions:
    def test_openai_n_choices(self, httpd):
        with _post(httpd, {"prompt": [5, 6, 7], "max_tokens": 4, "n": 3,
                           "temperature": 2.0, "seed": 5},
                   path="/v1/completions") as r:
            out = json.load(r)
        ch = out["choices"]
        assert [c["index"] for c in ch] == [0, 1, 2]
        assert out["usage"]["completion_tokens"] == sum(
            len(c["token_ids"]) for c in ch)
        # seeds 5,6,7 → (almost surely) not all identical at temp 2
        assert len({tuple(c["token_ids"]) for c in ch}) > 1
        # pinned seed ⇒ reproducible across calls
        with _post(httpd, {"prompt": [5, 6, 7], "max_tokens": 4, "n": 3,
                           "temperature": 2.0, "seed": 5},
                   path="/v1/completions") as r:
            again = json.load(r)
        assert ([c["token_ids"] for c in again["choices"]]
                == [c["token_ids"] for c in ch])

    def test_openai_n_out_of_range(self, httpd):
        import urllib.error
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(httpd, {"prompt": [5, 6], "n": 99},
                  path="/v1/completions")
        assert e.value.code == 400


class TestOpenAIStreaming:
    def _sse_events(self, resp):
        events = []
        for line in resp.read().decode().splitlines():
            if line.startswith("data: "):
                events.append(line[len("data: "):])
        return events

    def test_completions_sse(self, httpd):
        with _post(httpd, {"prompt": [5, 6, 7], "max_tokens": 4,
                           "stream": True}, path="/v1/completions") as r:
            assert r.headers["Content-Type"].startswith("text/event-stream")
            events = self._sse_events(r)
        assert events[-1] == "[DONE]"
        chunks = [json.loads(e) for e in events[:-1]]
        toks = [c["choices"][0]["token_id"] for c in chunks
                if c["choices"][0]["finish_reason"] is None]
        assert len(toks) == 4
        assert chunks[-1]["choices"][0]["finish_reason"] in ("stop",
                                                            "length")
        # streamed ids match the non-streamed completion
        with _post(httpd, {"prompt": [5, 6, 7], "max_tokens": 4},
                   path="/v1/completions") as r:
            out = json.load(r)
        assert toks == out["choices"][0]["token_ids"]

    def test_completions_sse_n2_interleaved(self, httpd):
        with _post(httpd, {"prompt": [5, 6, 7], "max_tokens": 3, "n": 2,
                           "temperature": 2.0, "seed": 4, "stream": True},
                   path="/v1/completions") as r:
            events = self._sse_events(r)
        assert events[-1] == "[DONE]"
        per_idx = {0: [], 1: []}
        finishes = set()
        for e in events[:-1]:
            c = json.loads(e)["choices"][0]
            if c["finish_reason"] is None:
                per_idx[c["index"]].append(c["token_id"])
            else:
                finishes.add(c["index"])
        assert len(per_idx[0]) == 3 and len(per_idx[1]) == 3
        assert finishes == {0, 1}


class TestGuidedAndBiasHTTP:
    def test_guided_choice_generate(self, httpd):
        choices = [[5, 9, 11], [7, 13]]
        with _post(httpd, {"prompt": [1, 2, 3],
                           "guided_choice": choices}) as r:
            ids = json.load(r)["token_ids"]
        if ids and ids[-1] == 1:          # scheduler appends the stop token
            ids = ids[:-1]
        assert ids in choices

    def test_openai_logit_bias_string_keys(self, httpd):
        """OpenAI-convention logit_bias (string token-id keys) forces the
        biased token under greedy decode."""
        with _post(httpd, {"prompt": [5, 6, 7], "max_tokens": 4,
                           "logit_bias": {"17": 100.0}},
                   path="/v1/completions") as r:
            out = json.load(r)
        assert out["choices"][0]["token_ids"] == [17] * 4

    def test_guided_regex_without_tokenizer_is_error(self, httpd):
        import urllib.error
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(httpd, {"prompt": [1, 2], "guided_regex": "a+"})
        assert e.value.code == 400
        assert "tokenizer" in json.load(e.value)["error"]

    def test_openai_bad_logit_bias_is_400(self, httpd):
        import urllib.error
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(httpd, {"prompt": [5, 6], "max_tokens": 2,
                          "logit_bias": {"x": "y"}},
                  path="/v1/completions")
        assert e.value.code == 400

    def test_openai_response_format_missing_schema_is_400(self, httpd):
        import urllib.error
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(httpd, {"prompt": [5, 6], "max_tokens": 2,
                          "response_format": {"type": "json_schema"}},
                  path="/v1/completions")
        assert e.value.code == 400

    def test_openai_json_object_without_tokenizer_is_error(self, httpd):
        import urllib.error
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(httpd, {"prompt": [5, 6], "max_tokens": 2,
                          "response_format": {"type": "json_object"}},
                  path="/v1/completions")
        assert e.value.code == 400
        assert "tokenizer" in json.dumps(json.load(e.value))


class TestScoringAndEcho:
    def test_max_tokens_zero_scores_prompt(self, httpd):
        with _post(httpd, {"prompt": [5, 6, 7, 8], "max_tokens": 0,
                           "logprobs": True},
                   path="/v1/completions") as r:
            out = json.load(r)
        ch = out["choices"][0]
        assert ch["token_ids"] == [] and out["usage"]["completion_tokens"] == 0
        lps = ch["logprobs"]["token_logprobs"]
        assert lps[0] is None and len(lps) == 4
        assert all(isinstance(v, float) and v <= 0 for v in lps[1:])

    def test_scoring_matches_engine_score(self, httpd):
        prompt = [9, 10, 11, 12]
        want = httpd.backend.engine.score([prompt])[0]
        with _post(httpd, {"prompt": prompt, "max_tokens": 0,
                           "logprobs": True},
                   path="/v1/completions") as r:
            got = json.load(r)["choices"][0]["logprobs"]["token_logprobs"]
        assert got[0] is None
        np.testing.assert_allclose(got[1:], want[1:], rtol=1e-5)

    def test_echo_prepends_prompt(self, httpd):
        prompt = [5, 6, 7]
        with _post(httpd, {"prompt": prompt, "max_tokens": 3,
                           "echo": True, "logprobs": True},
                   path="/v1/completions") as r:
            ch = json.load(r)["choices"][0]
        n_out = len(ch["token_ids"]) - len(prompt)
        assert ch["token_ids"][:3] == prompt and n_out >= 1
        lps = ch["logprobs"]["token_logprobs"]
        assert lps[0] is None and len(lps) == len(ch["token_ids"])

    def test_generate_prompt_logprobs(self, httpd):
        with _post(httpd, {"prompt": [5, 6, 7], "max_new_tokens": 2,
                           "prompt_logprobs": True}) as r:
            out = json.load(r)
        assert out["prompt_logprobs"][0] is None
        assert len(out["prompt_logprobs"]) == 3


class TestModelsAndBestOf:
    def test_v1_models_lists_base(self, httpd):
        with urllib.request.urlopen(_url(httpd, "/v1/models"),
                                    timeout=30) as r:
            out = json.load(r)
        ids = [m["id"] for m in out["data"]]
        assert httpd.backend.engine.cfg.name in ids

    def test_best_of_keeps_top_mean_logprob(self, httpd):
        with _post(httpd, {"prompt": [5, 6, 7], "max_tokens": 3, "n": 2,
                           "best_of": 4, "temperature": 2.0, "seed": 11,
                           "logprobs": True},
                   path="/v1/completions") as r:
            out = json.load(r)
        assert len(out["choices"]) == 2
        means = [sum(c["logprobs"]["token_logprobs"])
                 / len(c["logprobs"]["token_logprobs"])
                 for c in out["choices"]]
        # returned in rank order: best first
        assert means[0] >= means[1] - 1e-9

    def test_best_of_less_than_n_rejected(self, httpd):
        import urllib.error
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(httpd, {"prompt": [5, 6], "max_tokens": 2, "n": 3,
                          "best_of": 2}, path="/v1/completions")
        assert e.value.code == 400

    def test_best_of_with_stream_rejected(self, httpd):
        import urllib.error
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(httpd, {"prompt": [5, 6], "max_tokens": 2,
                          "best_of": 3, "stream": True},
                  path="/v1/completions")
        assert e.value.code == 400


class TestSpeculativeServing:
    def test_speculative_backend_matches_plain(self):
        cfg = tiny_llama(num_kv_heads=2)
        params = llama.init_params(cfg, jax.random.PRNGKey(0))
        engine = InferenceEngine(
            cfg, params,
            engine_cfg=EngineConfig(max_seq_len=128, decode_chunk=4,
                                    max_batch_size=2,
                                    prefill_buckets=(8, 16, 32)))
        gen = GenerationConfig(greedy=True, max_new_tokens=16,
                               eos_token_ids=(1,))
        plain = srv.ServingBackend(engine, gen, slots=2)
        w = plain.submit([3, 4, 5, 6] * 4)
        plain.wait(w, timeout=120)
        plain.shutdown()
        spec = srv.ServingBackend(engine, gen, speculative=True, slots=2,
                                  gamma=4)
        g = spec.submit([3, 4, 5, 6] * 4)
        spec.wait(g, timeout=120)
        stats = spec.sched.spec_stats
        spec.shutdown()
        assert g.output_ids == w.output_ids
        assert stats["accepted"] > 0

    def test_speculative_plus_paged_rejected(self):
        cfg = tiny_llama(num_kv_heads=2)
        params = llama.init_params(cfg, jax.random.PRNGKey(0))
        engine = InferenceEngine(
            cfg, params,
            engine_cfg=EngineConfig(max_seq_len=64, decode_chunk=4,
                                    max_batch_size=2,
                                    prefill_buckets=(8, 16)))
        with pytest.raises(ValueError, match="dense"):
            srv.ServingBackend(engine, paged=True, speculative=True)

    def test_draft_backend_matches_plain(self):
        cfg = tiny_llama(num_kv_heads=2)
        params = llama.init_params(cfg, jax.random.PRNGKey(0))
        ecfg = EngineConfig(max_seq_len=128, decode_chunk=4,
                            max_batch_size=2, prefill_buckets=(8, 16, 32))
        engine = InferenceEngine(cfg, params, engine_cfg=ecfg)
        draft = InferenceEngine(
            cfg, llama.init_params(cfg, jax.random.PRNGKey(3)),
            engine_cfg=ecfg)
        gen = GenerationConfig(greedy=True, max_new_tokens=12,
                               eos_token_ids=(1,))
        plain = srv.ServingBackend(engine, gen, slots=2)
        w = plain.submit([3, 4, 5, 6])
        plain.wait(w, timeout=120)
        plain.shutdown()
        spec = srv.ServingBackend(engine, gen, slots=2, gamma=3,
                                  draft_engine=draft)
        g = spec.submit([3, 4, 5, 6])
        spec.wait(g, timeout=120)
        spec.shutdown()
        assert g.output_ids == w.output_ids


class TestStopTokenTextTrim:
    def test_text_excludes_stop_token_piece(self):
        """Non-streaming responses must not include the terminating stop
        token's text (the stream never emitted it)."""
        class Tok:
            def encode(self, text, add_bos=True):
                return [int(t) for t in text.split()]

            def decode(self, ids):
                return "".join(f"{t} " for t in ids)

            def decode_token(self, tid):
                return f"{tid} "

        cfg = tiny_llama(num_kv_heads=2)
        params = llama.init_params(cfg, jax.random.PRNGKey(0))
        engine = InferenceEngine(
            cfg, params,
            engine_cfg=EngineConfig(max_seq_len=64, decode_chunk=4,
                                    max_batch_size=2,
                                    prefill_buckets=(8, 16)),
            tokenizer=Tok())
        gen = GenerationConfig(greedy=True, max_new_tokens=10,
                               eos_token_ids=())
        b = srv.ServingBackend(engine, gen, slots=2)
        base = b.submit([5, 6, 7])
        b.wait(base, timeout=120)
        stop_tok = base.output_ids[3]
        r = b.submit([5, 6, 7], stop_token_ids=[stop_tok])
        b.wait(r, timeout=120)
        b.shutdown()
        assert r.output_ids[-1] == stop_tok         # ids keep it
        text = srv._final_text(r, Tok())
        assert f"{stop_tok} " not in text.split(str(stop_tok) + " ")[0] \
            or not text.endswith(f"{stop_tok} ")
        assert text == "".join(f"{t} " for t in r.output_ids[:-1])


class TestEmbeddingsHTTP:
    def test_v1_embeddings(self, httpd):
        with _post(httpd, {"input": [[5, 6, 7], [9, 10]]},
                   path="/v1/embeddings") as r:
            out = json.load(r)
        assert out["object"] == "list" and len(out["data"]) == 2
        v = out["data"][0]["embedding"]
        assert abs(sum(x * x for x in v) - 1.0) < 1e-4   # L2-normalized
        want = httpd.backend.engine.embed([[5, 6, 7]])[0]
        np.testing.assert_allclose(v, want, atol=1e-6)

    def test_v1_embeddings_bad_input_is_400(self, httpd):
        import urllib.error
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(httpd, {"input": [[]]}, path="/v1/embeddings")
        assert e.value.code == 400


class TestPrometheusMetrics:
    def test_prometheus_exposition(self, httpd):
        with _post(httpd, {"prompt": [5, 6, 7], "max_new_tokens": 3}) as r:
            json.load(r)
        req = urllib.request.Request(
            _url(httpd, "/metrics?format=prometheus"))
        with urllib.request.urlopen(req, timeout=30) as r:
            assert "text/plain" in r.headers["Content-Type"]
            text = r.read().decode()
        assert "# TYPE llmi_ttft_s gauge" in text
        assert 'llmi_ttft_s{quantile="0.50"}' in text
        # JSON is still the default
        with urllib.request.urlopen(_url(httpd, "/metrics"),
                                    timeout=30) as r:
            snap = json.load(r)
        assert "ttft_s_p50" in snap
