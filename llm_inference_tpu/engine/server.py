"""HTTP serving front-end over the continuous-batching scheduler.

The reference's only interface is a blocking stdin REPL
(reference: user_entry.cpp:13-53). This module provides the production-
serving surface the north star asks for, with zero dependencies beyond the
standard library:

- POST /generate    {"prompt": str | [int], "max_new_tokens"?, ...}
                    → {"request_id", "token_ids", "text", "ttft_s", ...}
                    (add "stream": true for newline-delimited JSON chunks,
                    one per token — SSE-style streaming)
- GET  /health      → {"status": "ok", "queued": n, "active": n}
- GET  /metrics     → engine metrics (TTFT / tokens-per-s observations)
- GET  /v1/models   → base model + resident LoRA adapters (OpenAI list)
- POST /v1/completions, /v1/chat/completions — OpenAI-compatible
  (n choices, best_of server-side reranking, logprobs, penalties, seeds,
  stop, logit_bias, response_format json_schema → DFA-guided decoding,
  echo + max_tokens: 0 prompt-scoring via engine.score; "stream": true
  for SSE `data:` chunks with delta/text payloads terminated by
  `data: [DONE]`)

Guided decoding (engine/guided.py) is exposed on both surfaces:
`guided_choice` (strings, or token-id lists for tokenizer-free use),
`guided_regex`, `guided_json` — the constraint compiles to a token DFA
whose state rides the decode scan on device.

Architecture: HTTP handler threads enqueue requests into the scheduler (one
lock-guarded submit) and block on a per-request completion event; a single
background scheduler thread runs `step()` in a loop — the device only ever
sees the scheduler's batched programs, so concurrency costs no recompiles.
Sampling is per-request (temperature / top_k / top_p / greedy in the
request body ride as runtime arrays through one compiled decode program).
"""

from __future__ import annotations

import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

from llm_inference_tpu.config import GenerationConfig
from llm_inference_tpu.engine.engine import InferenceEngine
from llm_inference_tpu.engine.scheduler import (ContinuousBatchingScheduler,
                                                PagedScheduler)


def _final_text(req, tok) -> str:
    """Completion text for a finished request: stop-string requests are
    already trimmed (final_text); stop-TOKEN requests exclude the
    terminating token's piece (the stream path never emitted it, and
    OpenAI responses don't include stop sequences)."""
    if req.final_text is not None:
        return req.final_text
    if tok is None:
        return ""
    ids = req.output_ids
    if req.finished and ids:
        ids = ids[:-1]
    return tok.decode(ids)


class ServingBackend:
    """Thread-safe wrapper: scheduler + background step loop + completion
    signaling. Usable on its own (tests drive it without sockets)."""

    def __init__(self, engine: InferenceEngine,
                 gen: Optional[GenerationConfig] = None,
                 paged: bool = False, speculative: bool = False,
                 **sched_kw):
        if speculative and paged:
            raise ValueError("speculative serving uses the dense "
                             "scheduler (no paged variant yet)")
        draft_engine = sched_kw.pop("draft_engine", None)
        if draft_engine is not None:
            from llm_inference_tpu.engine.speculative import (
                DraftSpeculativeBatchingScheduler)
            self.engine = engine
            self.sched = DraftSpeculativeBatchingScheduler(
                engine, draft_engine, gen, **sched_kw)
            self._start_loop()
            return
        if speculative:
            from llm_inference_tpu.engine.speculative import (
                SpeculativeBatchingScheduler)
            cls = SpeculativeBatchingScheduler
        else:
            cls = PagedScheduler if paged else ContinuousBatchingScheduler
        self.engine = engine
        self.sched = cls(engine, gen, **sched_kw)
        self._start_loop()

    def _start_loop(self):
        self._lock = threading.Lock()
        self._wake = threading.Event()
        self._done = {}
        self._reqs = {}
        self._done_at = {}                      # completion time, for GC
        self._stop = False
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    # -- request side -------------------------------------------------------

    def submit(self, prompt, max_new_tokens=None, on_token=None,
               **sampling):
        """Enqueue; returns the Request (attach to wait()). `sampling`:
        temperature / top_k / top_p / greedy per-request overrides."""
        with self._lock:
            req = self.sched.submit(prompt, max_new_tokens,
                                    stream=on_token, **sampling)
            self._done[req.req_id] = threading.Event()
            self._reqs[req.req_id] = req
        self._wake.set()
        return req

    def cancel(self, req_id: int) -> bool:
        """Abort a queued or running request (frees its KV pages)."""
        with self._lock:
            req = self._reqs.get(req_id)
            if req is None or req.done_t > 0:
                return False
            return self.sched.cancel(req)

    def validate(self, prompt, max_new_tokens=None,
                 sampling=None) -> None:
        """Raise the same errors submit would, WITHOUT enqueuing — lets the
        HTTP stream path reject before committing the 200 status line.
        (The queue can still fill between validate and submit; the stream
        handler reports THAT as an NDJSON error object, never a second
        status line.)"""
        from llm_inference_tpu.engine.scheduler import Request
        with self._lock:
            ids = self.engine._encode_prompts([prompt])[0]
            limit = max_new_tokens or self.sched.gen.max_new_tokens
            if len(ids) + limit > self.sched.S:
                raise ValueError(
                    f"prompt({len(ids)}) + max_new_tokens exceeds "
                    f"max_seq_len {self.sched.S}")
            if sampling:
                self.sched._resolve_sampling(
                    Request(req_id=-1, prompt_ids=[], max_new_tokens=1,
                            **sampling))
            queued = len(self.sched.queue)
            if queued >= self.engine.engine_cfg.max_queued_requests:
                raise RuntimeError("request queue full")

    def wait(self, req, timeout=None) -> bool:
        ev = self._done[req.req_id]
        ok = ev.wait(timeout)
        if ok:
            # GC: completed + collected entries leave the scan set
            self._done.pop(req.req_id, None)
            self._reqs.pop(req.req_id, None)
            self._done_at.pop(req.req_id, None)
        return ok

    # -- scheduler side ------------------------------------------------------

    def _loop(self):
        while not self._stop:
            with self._lock:
                progressed = self.sched.step()
                for b_req, ev in list(self._done.items()):
                    if ev.is_set():
                        continue
                    # a request is complete once it left queue and slots
                    if (all(r is None or r.req_id != b_req
                            for r in self.sched.slot_req)
                            and all(q.req_id != b_req
                                    for q in self.sched.queue)):
                        ev.set()
                        self._done_at[b_req] = time.monotonic()
                # abandoned waiters (timed-out wait / fire-and-forget
                # submits) would leak their entries forever — GC a minute
                # after completion
                cutoff = time.monotonic() - 60.0
                for rid, at in list(self._done_at.items()):
                    if at < cutoff:
                        self._done.pop(rid, None)
                        self._reqs.pop(rid, None)
                        self._done_at.pop(rid, None)
            if not progressed:
                self._wake.wait(timeout=0.05)
                self._wake.clear()

    def shutdown(self):
        self._stop = True
        self._wake.set()
        self._thread.join(timeout=5)

    def stats(self):
        with self._lock:
            return {
                "queued": len(self.sched.queue),
                "active": sum(r is not None for r in self.sched.slot_req),
            }


def make_handler(backend: ServingBackend):
    tok = backend.engine.tokenizer

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _json(self, code, obj):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/health":
                self._json(200, {"status": "ok", **backend.stats()})
            elif self.path.startswith("/metrics"):
                if ("format=prometheus" in self.path
                        or "text/plain" in (self.headers.get("Accept")
                                            or "")):
                    body = backend.engine.metrics.prometheus().encode()
                    self.send_response(200)
                    self.send_header("Content-Type",
                                     "text/plain; version=0.0.4")
                    self.send_header("Content-Length", str(len(body)))
                    self.end_headers()
                    self.wfile.write(body)
                else:
                    self._json(200, backend.engine.metrics.snapshot())
            elif self.path == "/v1/models":
                # OpenAI model listing: the base model plus every resident
                # LoRA adapter (selectable as `model` on /v1 requests)
                names = ([backend.engine.cfg.name]
                         + sorted(backend.engine.adapter_slots))
                self._json(200, {"object": "list", "data": [
                    {"id": m, "object": "model",
                     "owned_by": "llm_inference_tpu"} for m in names]})
            else:
                self._json(404, {"error": "unknown path"})

        def do_POST(self):
            if self.path in ("/v1/completions", "/v1/chat/completions"):
                self._openai(chat=self.path.endswith("chat/completions"))
                return
            if self.path == "/v1/embeddings":
                try:
                    n = int(self.headers.get("Content-Length", 0))
                    body = json.loads(self.rfile.read(n) or b"{}")
                    inp = body["input"]
                    if isinstance(inp, str) or (
                            inp and isinstance(inp[0], int)):
                        inp = [inp]          # single string / one id list
                    # encode once: embed() accepts id lists unchanged, and
                    # usage needs the same token counts
                    token_lists = backend.engine._encode_prompts(inp)
                    vecs = backend.engine.embed(
                        token_lists, pooling=body.get("pooling", "last"))
                except (KeyError, TypeError, ValueError,
                        NotImplementedError) as e:
                    self._json(400, {"error": {
                        "message": f"bad request: {e}",
                        "type": "invalid_request_error"}})
                    return
                ntok = sum(len(t) for t in token_lists)
                self._json(200, {
                    "object": "list",
                    "model": backend.engine.cfg.name,
                    "data": [{"object": "embedding", "index": i,
                              "embedding": v}
                             for i, v in enumerate(vecs)],
                    # OpenAI embeddings semantics: total == prompt tokens
                    "usage": {"prompt_tokens": ntok,
                              "total_tokens": ntok}})
                return
            if self.path == "/cancel":
                try:
                    n = int(self.headers.get("Content-Length", 0))
                    rid = int(json.loads(self.rfile.read(n))["request_id"])
                except (KeyError, ValueError, TypeError) as e:
                    self._json(400, {"error": f"bad request: {e}"})
                    return
                self._json(200, {"request_id": rid,
                                 "cancelled": backend.cancel(rid)})
                return
            if self.path != "/generate":
                self._json(404, {"error": "unknown path"})
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                body = json.loads(self.rfile.read(n) or b"{}")
                prompt = body["prompt"]
            except (KeyError, TypeError, ValueError) as e:
                self._json(400, {"error": f"bad request: {e}"})
                return
            max_new = body.get("max_new_tokens")
            stream = bool(body.get("stream"))
            samp = {k: body[k] for k in (
                "temperature", "top_k", "top_p", "greedy", "min_p",
                "repetition_penalty", "presence_penalty",
                "frequency_penalty", "seed", "stop_token_ids", "stop",
                "top_logprobs", "adapter", "logit_bias", "guided_choice",
                "guided_regex", "guided_json") if k in body}
            try:
                if stream:
                    # validate BEFORE committing the 200 + ndjson headers —
                    # an error mid-stream can't become a proper status line
                    backend.validate(prompt, max_new, samp)
                    self.send_response(200)
                    self.send_header("Content-Type",
                                     "application/x-ndjson")
                    self.end_headers()

                    hreq = []

                    def on_token(rid, t):
                        piece = tok.decode_token(t) if tok else ""
                        chunk = json.dumps({"token_id": t,
                                            "text": piece}) + "\n"
                        try:
                            self.wfile.write(chunk.encode())
                            self.wfile.flush()
                        except OSError:
                            # client gone: abort the request (frees its KV
                            # pages at the next harvest). This callback runs
                            # on the SCHEDULER thread — flag directly, never
                            # raise (an escaping socket error would kill the
                            # step loop for every request)
                            if hreq:
                                hreq[0].cancelled = True
                    try:
                        req = backend.submit(prompt, max_new, on_token,
                                             **samp)
                    except (ValueError, RuntimeError) as e:
                        # headers are committed: report in-band, one object
                        self.wfile.write((json.dumps(
                            {"error": str(e), "done": True}) + "\n")
                            .encode())
                        return
                    hreq.append(req)
                    backend.wait(req)
                    tail = json.dumps({"done": True,
                                       "request_id": req.req_id,
                                       "finished": req.finished}) + "\n"
                    try:
                        self.wfile.write(tail.encode())
                    except OSError:
                        pass
                else:
                    req = backend.submit(prompt, max_new, **samp)
                    backend.wait(req)
                    text = _final_text(req, tok)
                    resp = {
                        "request_id": req.req_id,
                        "token_ids": req.output_ids,
                        "text": text,
                        "finished": req.finished,
                        "ttft_s": req.ttft_s,
                    }
                    if body.get("logprobs"):
                        resp["token_logprobs"] = req.output_logprobs
                    if body.get("prompt_logprobs"):
                        # per-token prompt logprobs (engine.score); first
                        # token has no prediction → null
                        resp["prompt_logprobs"] = (
                            backend.engine.score([prompt])[0])
                    if body.get("top_logprobs"):
                        resp["top_logprobs"] = [
                            [{"token_id": i, "logprob": v}
                             for i, v in alts]
                            for alts in req.output_top_logprobs]
                    self._json(200, resp)
            except ValueError as e:           # oversized prompt etc.
                self._json(400, {"error": str(e)})
            except RuntimeError as e:         # queue full → backpressure
                self._json(503, {"error": str(e)})

        # -- OpenAI-compatible surface (/v1/completions, /v1/chat/...) ----

        def _openai(self, chat: bool):
            """Minimal OpenAI-API-shaped endpoint so standard clients work
            unchanged (non-streaming; `prompt` may be a string — needs a
            tokenizer — or a token-id list)."""
            try:
                n = int(self.headers.get("Content-Length", 0))
                body = json.loads(self.rfile.read(n) or b"{}")
                if chat:
                    from llm_inference_tpu.engine.engine import (
                        format_chat_messages)
                    if tok is None:
                        raise ValueError("chat endpoint needs a tokenizer")
                    prompt = format_chat_messages(
                        body["messages"], backend.engine.cfg.name)
                else:
                    prompt = body["prompt"]
            except (KeyError, TypeError, ValueError) as e:
                self._json(400, {"error": {"message": f"bad request: {e}",
                                           "type": "invalid_request_error"}})
                return
            max_new = body.get("max_tokens")
            samp = {k: body[k] for k in (
                "temperature", "top_p", "presence_penalty",
                "frequency_penalty", "seed", "stop", "guided_choice",
                "guided_regex", "guided_json") if k in body}
            # OpenAI logit_bias arrives with STRING token-id keys
            if body.get("logit_bias"):
                try:
                    samp["logit_bias"] = {int(k): float(v) for k, v
                                          in body["logit_bias"].items()}
                except (TypeError, ValueError):
                    self._json(400, {"error": {
                        "message": "logit_bias must map token ids to "
                                   "numbers",
                        "type": "invalid_request_error"}})
                    return
            # OpenAI structured outputs: response_format json_schema →
            # DFA-guided decoding (flat schemas; nested objects rejected
            # at submit)
            rf = body.get("response_format")
            if isinstance(rf, dict) and rf.get("type") == "json_schema":
                try:
                    samp["guided_json"] = rf["json_schema"]["schema"]
                except (KeyError, TypeError):
                    self._json(400, {"error": {
                        "message": "response_format.json_schema.schema "
                                   "missing",
                        "type": "invalid_request_error"}})
                    return
            elif isinstance(rf, dict) and rf.get("type") == "json_object":
                # free-form JSON mode: depth-bounded grammar (regular)
                from llm_inference_tpu.engine import guided as _guided
                samp["guided_regex"] = _guided.json_value_regex(2)
            # OpenAI `logprobs: N` → per-token top-N alternatives
            lp_n = body.get("logprobs")
            if isinstance(lp_n, int) and lp_n > 0:
                samp["top_logprobs"] = lp_n
            # vLLM-style multi-LoRA: `model` naming a registered adapter
            # routes the request through that adapter
            if body.get("model") in backend.engine.adapter_slots:
                samp["adapter"] = body["model"]
            n = int(body.get("n", 1) or 1)
            if not 1 <= n <= 16:
                self._json(400, {"error": {"message": f"n={n} out of "
                                           "range [1, 16]",
                                           "type": "invalid_request_error"}})
                return
            # OpenAI scoring mode: echo returns the prompt (with its
            # per-token logprobs when logprobs is set — engine.score);
            # max_tokens: 0 skips generation entirely (pure scoring)
            echo = bool(body.get("echo")) and not chat
            scoring_only = max_new == 0
            pscore = None
            try:
                if (echo and body.get("logprobs")) or (
                        scoring_only and body.get("logprobs")):
                    pscore = backend.engine.score([prompt])[0]
                if scoring_only:
                    pids = backend.engine._encode_prompts([prompt])[0]
                    ptxt = (prompt if isinstance(prompt, str)
                            else tok.decode(pids) if tok else "")
                    choice = {"index": 0, "finish_reason": "stop",
                              "text": ptxt if echo else "",
                              "token_ids": []}
                    if pscore is not None:
                        choice["logprobs"] = {
                            "token_logprobs": pscore, "tokens": pids}
                    self._json(200, {
                        "id": "cmpl-score", "object": "text_completion",
                        "model": backend.engine.cfg.name,
                        "choices": [choice],
                        "usage": {"prompt_tokens": len(pids),
                                  "completion_tokens": 0,
                                  "total_tokens": len(pids)}})
                    return
            except (ValueError, NotImplementedError) as e:
                self._json(400, {"error": {"message": str(e),
                                           "type": "invalid_request_error"}})
                return
            if body.get("stream"):
                if int(body.get("best_of", n) or n) > n:
                    self._json(400, {"error": {
                        "message": "best_of cannot be used with stream",
                        "type": "invalid_request_error"}})
                    return
                self._openai_stream(body, prompt, max_new, samp, n, chat)
                return
            # n parallel completions: n scheduler requests with distinct
            # seeds (seed+i when the body pins one) batching through the
            # shared decode program; with --prefix-cache the shared prompt
            # prefills once and the siblings map its pages.
            # best_of > n generates extra server-side candidates and keeps
            # the n with the highest mean token logprob (OpenAI semantics)
            best_of = int(body.get("best_of", n) or n)
            if best_of < n or best_of > 16:
                self._json(400, {"error": {
                    "message": f"best_of={best_of} must be in [n, 16]",
                    "type": "invalid_request_error"}})
                return
            reqs = []
            try:
                for i in range(best_of):
                    samp_i = dict(samp)
                    if "seed" in samp_i and best_of > 1:
                        samp_i["seed"] = int(samp_i["seed"]) + i
                    reqs.append(backend.submit(prompt, max_new, **samp_i))
                for req in reqs:
                    backend.wait(req)
                # usage counts everything GENERATED (OpenAI bills all
                # best_of candidates, not just the kept ones)
                generated_toks = sum(len(r.output_ids) for r in reqs)
                if best_of > n:
                    reqs.sort(key=lambda r: -(
                        sum(r.output_logprobs) / max(len(r.output_logprobs),
                                                     1)))
                    reqs = reqs[:n]
            except ValueError as e:
                for r in reqs:
                    backend.cancel(r.req_id)
                self._json(400, {"error": {"message": str(e),
                                           "type": "invalid_request_error"}})
                return
            except RuntimeError as e:
                for r in reqs:
                    backend.cancel(r.req_id)
                self._json(503, {"error": {"message": str(e),
                                           "type": "overloaded_error"}})
                return
            choices = []
            for i, req in enumerate(reqs):
                text = _final_text(req, tok)
                finish = "stop" if req.finished else "length"
                if chat:
                    choice = {"index": i, "finish_reason": finish,
                              "message": {"role": "assistant",
                                          "content": text}}
                else:
                    choice = {"index": i, "finish_reason": finish,
                              "text": text, "token_ids": req.output_ids}
                    if req.output_top_logprobs:
                        toks_txt = ([tok.decode_token(t) for t in
                                     req.output_ids] if tok
                                    else [str(t) for t in req.output_ids])
                        choice["logprobs"] = {
                            "tokens": toks_txt,
                            "token_logprobs": req.output_logprobs,
                            "top_logprobs": [
                                {(tok.decode_token(i2) if tok else str(i2)):
                                 v for i2, v in alts}
                                for alts in req.output_top_logprobs],
                        }
                if body.get("logprobs") and "logprobs" not in choice:
                    # logprobs: true/0 → chosen-token logprobs only (the
                    # int-N form also carries top-N alternatives)
                    choice["logprobs"] = {
                        "token_logprobs": req.output_logprobs,
                        "tokens": req.output_ids,
                    }
                if echo:
                    # prepend the prompt (and its logprobs) to the choice
                    ptxt = (prompt if isinstance(prompt, str)
                            else tok.decode(req.prompt_ids) if tok else "")
                    choice["text"] = ptxt + choice.get("text", "")
                    choice["token_ids"] = (list(req.prompt_ids)
                                           + choice.get("token_ids", []))
                    if pscore is not None and "logprobs" in choice:
                        lp = choice["logprobs"]
                        lp["token_logprobs"] = (pscore
                                                + lp["token_logprobs"])
                        lp["tokens"] = (list(req.prompt_ids)
                                        + list(lp["tokens"]))
                choices.append(choice)
            obj = "chat.completion" if chat else "text_completion"
            usage = {"prompt_tokens": len(reqs[0].prompt_ids),
                     "completion_tokens": generated_toks,
                     "total_tokens": len(reqs[0].prompt_ids)
                                     + generated_toks}
            self._json(200, {
                "id": f"cmpl-{reqs[0].req_id}", "object": obj,
                "model": backend.engine.cfg.name,
                "choices": choices, "usage": usage,
            })

        def _openai_stream(self, body, prompt, max_new, samp, n, chat):
            """OpenAI SSE streaming (`stream: true`): `data: {chunk}` per
            token, interleaved by choice index for n > 1, terminated by
            `data: [DONE]`. Chat chunks carry delta.content (role on the
            first delta, OpenAI-style); completions chunks carry text."""
            try:
                backend.validate(prompt, max_new, samp)
            except (ValueError, RuntimeError) as e:
                code = 503 if isinstance(e, RuntimeError) else 400
                self._json(code, {"error": {"message": str(e),
                                            "type": "invalid_request_error"
                                            if code == 400 else
                                            "overloaded_error"}})
                return
            self.send_response(200)
            self.send_header("Content-Type", "text/event-stream")
            self.send_header("Cache-Control", "no-cache")
            self.end_headers()
            obj = ("chat.completion.chunk" if chat
                   else "text_completion")
            model = backend.engine.cfg.name
            lock = threading.Lock()
            sent_role = [False] * n
            reqs = []

            def write_sse(payload):
                try:
                    self.wfile.write(f"data: {payload}\n\n".encode())
                    self.wfile.flush()
                    return True
                except OSError:
                    for r in reqs:
                        r.cancelled = True    # client gone: free the slots
                    return False

            def on_token_for(idx):
                def on_token(rid, t):
                    piece = tok.decode_token(t) if tok else str(t)
                    if chat:
                        delta = {"content": piece}
                        if not sent_role[idx]:
                            delta = {"role": "assistant", "content": piece}
                            sent_role[idx] = True
                        choice = {"index": idx, "delta": delta,
                                  "finish_reason": None}
                    else:
                        choice = {"index": idx, "text": piece,
                                  "token_id": t, "finish_reason": None}
                    with lock:
                        write_sse(json.dumps({
                            "id": f"cmpl-{rid}", "object": obj,
                            "model": model, "choices": [choice]}))
                return on_token

            try:
                for i in range(n):
                    samp_i = dict(samp)
                    if "seed" in samp_i and n > 1:
                        samp_i["seed"] = int(samp_i["seed"]) + i
                    reqs.append(backend.submit(
                        prompt, max_new, on_token_for(i), **samp_i))
            except (ValueError, RuntimeError) as e:
                # headers committed: report in-band
                for r in reqs:
                    backend.cancel(r.req_id)
                with lock:
                    write_sse(json.dumps({"error": str(e)}))
                    write_sse("[DONE]")
                return
            for req in reqs:
                backend.wait(req)
            with lock:
                for i, req in enumerate(reqs):
                    finish = "stop" if req.finished else "length"
                    choice = ({"index": i, "delta": {},
                               "finish_reason": finish} if chat else
                              {"index": i, "text": "",
                               "finish_reason": finish})
                    write_sse(json.dumps({
                        "id": f"cmpl-{req.req_id}", "object": obj,
                        "model": model, "choices": [choice]}))
                write_sse("[DONE]")

    return Handler


def warmup(backend: ServingBackend) -> None:
    """Pre-compile the serving programs (each prefill bucket INCLUDING the
    largest, plus the steady-state decode-chunk scan) with throwaway
    requests so the FIRST real request's TTFT is dispatch-bound, not
    compile-bound (seconds on CPU, minutes for a 7B through the relay).
    Best-effort: an early EOS on the dummy prompt can cut a decode short."""
    ecfg = backend.engine.engine_cfg
    want = ecfg.decode_chunk + 1   # budget covers a FULL decode chunk
    buckets = [b for b in ecfg.prefill_buckets if b <= ecfg.max_seq_len]
    for b in buckets:
        # longest prompt that still lands in bucket b with `want` budget
        plen = min(b, ecfg.max_seq_len - want)
        if plen < 1:
            continue
        req = backend.submit([1] * plen, want)
        backend.wait(req)


def serve(engine: InferenceEngine, host: str = "0.0.0.0", port: int = 8000,
          gen: Optional[GenerationConfig] = None, paged: bool = False,
          speculative: bool = False, warm: bool = False,
          **sched_kw) -> ThreadingHTTPServer:
    """Start the HTTP server (returns it; call .serve_forever())."""
    backend = ServingBackend(engine, gen, paged=paged,
                             speculative=speculative, **sched_kw)
    if warm:
        warmup(backend)
    httpd = ThreadingHTTPServer((host, port), make_handler(backend))
    httpd.backend = backend
    return httpd


def main(argv=None):
    import argparse
    import sys
    from llm_inference_tpu import cli as _cli

    ap = argparse.ArgumentParser(description="TPU LLM HTTP server")
    ap.add_argument("--host", default="0.0.0.0")
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--paged", action="store_true")
    ap.add_argument("--prefix-cache", action="store_true",
                    help="share identical prompt-prefix KV pages across "
                         "requests (implies --paged)")
    ap.add_argument("--speculative", action="store_true",
                    help="n-gram speculative decoding per slot "
                         "(greedy-only; dense scheduler)")
    ap.add_argument("--gamma", type=int, default=4,
                    help="speculative window width (proposed tokens)")
    ap.add_argument("--draft-model", default=None,
                    help="preset name of a DRAFT model for two-model "
                         "speculative serving (greedy-only)")
    ap.add_argument("--draft-checkpoint", default=None,
                    help="HF safetensors dir for the draft's weights "
                         "(else dummy weights)")
    ap.add_argument("--slots", type=int, default=None)
    # engine-building flags (same set as the chat CLI)
    ap.add_argument("--model", default="tiny")
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--tokenizer", default=None)
    ap.add_argument("--dtype", default=None)
    ap.add_argument("--quant", default="none")
    ap.add_argument("--group-size", type=int, default=0)
    ap.add_argument("--asym", action="store_true",
                    help="asymmetric (min/max, zero-point) weight quantization")
    ap.add_argument("--kv-cache", default="bf16")
    ap.add_argument("--lora", action="append", default=None,
                    metavar="NAME=PEFT_DIR",
                    help="serve a LoRA adapter (repeatable); requests "
                         "route via `adapter` or /v1 model=NAME")
    ap.add_argument("--tp", type=int, default=1)
    ap.add_argument("--dp", type=int, default=1)
    ap.add_argument("--max-seq-len", type=int, default=2048)
    ap.add_argument("--decode-chunk", type=int, default=8)
    ap.add_argument("--max-new-tokens", type=int, default=256)
    ap.add_argument("--greedy", action="store_true", default=True)
    ap.add_argument("--warmup", action="store_true",
                    help="pre-compile all prefill buckets + decode before "
                         "accepting traffic")
    args = ap.parse_args(argv)

    engine = _cli.build_engine(args)
    gen = GenerationConfig(greedy=True, max_new_tokens=args.max_new_tokens)
    kw = {}
    if args.prefix_cache:
        kw["prefix_cache"] = True
    if args.speculative or args.draft_model:
        kw["gamma"] = args.gamma
    if args.draft_model:
        import copy
        dargs = copy.copy(args)
        dargs.model = args.draft_model
        dargs.checkpoint = args.draft_checkpoint
        dargs.lora = None
        dargs.tp = dargs.dp = 1        # draft stays single-device
        kw["draft_engine"] = _cli.build_engine(dargs)
    httpd = serve(engine, args.host, args.port, gen,
                  paged=args.paged or args.prefix_cache,
                  speculative=args.speculative,
                  warm=args.warmup, slots=args.slots, **kw)
    print(f"serving on {args.host}:{args.port}", file=sys.stderr)
    httpd.serve_forever()


if __name__ == "__main__":
    main()
