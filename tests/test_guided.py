"""Guided decoding: constraint → token-DFA compiler (engine/guided.py)
and on-device DFA-constrained sampling through the scheduler.

No reference analogue (the reference samples unconstrained top-K,
src/kernels/sampling.cu); oracle here is direct: every emitted output
must match the constraint exactly, and a greedy run must pick the
highest-logit token among ALLOWED ones at each step."""

import re

import numpy as np
import pytest

import jax

from llm_inference_tpu.config import (EngineConfig, GenerationConfig,
                                      tiny_llama)
from llm_inference_tpu.engine import guided
from llm_inference_tpu.engine.engine import InferenceEngine
from llm_inference_tpu.engine.scheduler import (ContinuousBatchingScheduler,
                                                PagedScheduler)
from llm_inference_tpu.models import llama


class FakeTok:
    """id ↔ string table tokenizer for DFA tests."""

    def __init__(self, pieces):
        self.pieces = list(pieces)

    def decode_token(self, t):
        return self.pieces[t]

    def decode(self, ids):
        return "".join(self.pieces[t] for t in ids)

    def encode(self, text, add_bos=True):
        raise NotImplementedError


def _gen_all(dfa: guided.TokenDFA, eos_ids, limit=32):
    """Enumerate all token sequences the DFA accepts (ending in EOS)."""
    out = []
    stack = [(dfa.start, [])]
    while stack:
        s, seq = stack.pop()
        if len(seq) > limit:
            continue
        for t in np.nonzero(dfa.mask[s])[0]:
            if t in eos_ids:
                out.append(tuple(seq))
            else:
                stack.append((int(dfa.trans[s, t]), seq + [int(t)]))
    return sorted(set(out))


class TestCharDFA:
    def _match(self, dfa: guided.CharDFA, s: str) -> bool:
        cur = dfa.start
        for c in s:
            cur = dfa.step(cur, c)
            if cur == 0:
                return False
        return cur in dfa.accept

    @pytest.mark.parametrize("pattern,yes,no", [
        (r"abc", ["abc"], ["ab", "abcd", "abd", ""]),
        (r"a*b", ["b", "ab", "aaab"], ["a", "ba", ""]),
        (r"a+", ["a", "aa"], ["", "b"]),
        (r"colou?r", ["color", "colour"], ["colouur"]),
        (r"(ab|cd)+", ["ab", "cdab", "ababcd"], ["", "a", "abc"]),
        (r"\d{2,4}", ["12", "123", "1234"], ["1", "12345", "ab"]),
        (r"[a-c]x", ["ax", "bx", "cx"], ["dx", "x"]),
        (r"[^a-c]x", ["dx", "zx", "1x"], ["ax", "x", "xx" "bx"]),
        (r"a.c", ["abc", "azc", "a.c"], ["ac", "a\nc"]),
        (r"-?(0|[1-9]\d*)", ["0", "7", "42", "-13"], ["00", "01", "-"]),
        (r"\w+@\w+\.com", ["a_1@b.com"], ["a@b.org", "@b.com"]),
        (r"a{3}", ["aaa"], ["aa", "aaaa"]),
        (r"(x|y){1,2}", ["x", "xy", "yy"], ["", "xyx"]),
        (r"ab\|c", ["ab|c"], ["ab", "c"]),
    ])
    def test_regex_semantics(self, pattern, yes, no):
        dfa = guided.char_dfa_for_regex(pattern)
        for s in yes:
            assert self._match(dfa, s), (pattern, s)
            assert re.fullmatch(pattern, s), ("oracle disagrees", pattern, s)
        for s in no:
            assert not self._match(dfa, s), (pattern, s)
            assert not re.fullmatch(pattern, s), ("oracle", pattern, s)

    def test_random_strings_vs_re(self):
        """Fuzz: DFA must agree with python re on random strings."""
        patterns = [r"(ab|a)*b", r"\d+(\.\d+)?", r"[ab]c[de]?",
                    r"a(b|c)*d", r"x{2,3}y*"]
        rng = np.random.default_rng(0)
        alphabet = "abcdexy.0123456789"
        for pat in patterns:
            dfa = guided.char_dfa_for_regex(pat)
            for _ in range(300):
                n = int(rng.integers(0, 7))
                s = "".join(rng.choice(list(alphabet), n))
                assert self._match(dfa, s) == bool(re.fullmatch(pat, s)), \
                    (pat, s)

    def test_choices_trie(self):
        dfa = guided.char_dfa_for_choices(["cat", "car", "dog"])
        for s in ["cat", "car", "dog"]:
            assert self._match(dfa, s)
        for s in ["ca", "cats", "do", "catr", ""]:
            assert not self._match(dfa, s)

    def test_state_blowup_guard(self):
        with pytest.raises(ValueError, match="too complex"):
            # (a|aa){40} style exponential subset blowup... use a pattern
            # with many overlapping counted reps
            guided.char_dfa_for_regex("(a|b|ab|ba){200}" * 8)


class TestTokenDFA:
    def test_token_choices_exact(self):
        dfa = guided.from_token_sequences([[3, 4], [3, 5, 6], [7]],
                                          vocab_size=10, eos_ids=[0])
        assert _gen_all(dfa, {0}) == [(3, 4), (3, 5, 6), (7,)]
        assert dfa.walk([3, 5]) not in (0,)      # alive mid-match
        assert dfa.walk([4]) == 0                # dead on bad first token

    def test_token_choices_prefix(self):
        """A choice that is a prefix of another may terminate early."""
        dfa = guided.from_token_sequences([[3], [3, 4]], vocab_size=10,
                                          eos_ids=[9])
        assert _gen_all(dfa, {9}) == [(3,), (3, 4)]

    def test_string_choices_multi_token(self):
        tok = FakeTok(["<eos>", "ca", "t", "r", "dog", "c", "a"])
        dfa = guided.dfa_for_choices(["cat", "car", "dog"], tok, 7, [0])
        seqs = _gen_all(dfa, {0})
        texts = sorted(tok.decode(s) for s in seqs)
        # every tokenization of every choice: ca+t, c+a+t, ca+r, c+a+r, dog
        assert texts == ["car", "car", "cat", "cat", "dog"]
        assert (1, 2) in seqs and (5, 6, 2) in seqs and (4,) in seqs

    def test_regex_token_dfa(self):
        tok = FakeTok(["<eos>", "1", "2", "12", "a", ""])
        dfa = guided.dfa_for_regex(r"\d{2}", tok, 6, [0])
        seqs = _gen_all(dfa, {0})
        assert set(seqs) == {(1, 1), (1, 2), (2, 1), (2, 2), (3,)}
        # empty-string token (id 5) never allowed
        assert not dfa.mask[:, 5].any()

    def test_walk_replay(self):
        tok = FakeTok(["<eos>", "1", "2", "12"])
        dfa = guided.dfa_for_regex(r"\d{3}", tok, 4, [0])
        s = dfa.walk([1, 2])
        assert s != 0 and dfa.mask[s, 1] and not dfa.mask[s, 3]

    def test_eos_required(self):
        with pytest.raises(ValueError, match="EOS"):
            guided.from_token_sequences([[1]], vocab_size=4, eos_ids=[])


class TestJsonSchema:
    TOK = None

    def _dfa(self, schema):
        # byte-ish tokenizer over printable chars: id i -> chr(i)
        pieces = [""] + [chr(c) for c in range(32, 127)]
        tok = FakeTok(pieces)
        return (guided.dfa_for_json_schema(schema, tok, len(pieces), [0]),
                tok)

    def _accepts(self, dfa, tok, text):
        ids = []
        for ch in text:
            ids.append(tok.pieces.index(ch))
        s = dfa.walk(ids)
        return s != 0 and bool(dfa.mask[s, 0])

    def test_flat_object(self):
        schema = {"type": "object",
                  "properties": {"name": {"type": "string"},
                                 "age": {"type": "integer"},
                                 "ok": {"type": "boolean"}}}
        dfa, tok = self._dfa(schema)
        assert self._accepts(dfa, tok, '{"name": "bo", "age": 3, '
                                       '"ok": true}')
        assert self._accepts(dfa, tok, '{"name":"x","age":-42,"ok":false}')
        assert not self._accepts(dfa, tok, '{"age": 3}')        # missing
        assert not self._accepts(dfa, tok, '{"name": "x", "age": 3.5, '
                                           '"ok": true}')       # non-int
        assert not self._accepts(dfa, tok, '{"name": x, "age": 3, '
                                           '"ok": true}')       # bare str

    def test_enum_and_number(self):
        schema = {"type": "object",
                  "properties": {"kind": {"enum": ["a", "b"]},
                                 "score": {"type": "number"}}}
        dfa, tok = self._dfa(schema)
        assert self._accepts(dfa, tok, '{"kind": "a", "score": 1.5}')
        assert self._accepts(dfa, tok, '{"kind": "b", "score": -2e3}')
        assert not self._accepts(dfa, tok, '{"kind": "c", "score": 1}')

    def test_array_bounds(self):
        schema = {"type": "object",
                  "properties": {"xs": {"type": "array",
                                        "items": {"type": "integer"},
                                        "minItems": 1, "maxItems": 3}}}
        dfa, tok = self._dfa(schema)
        assert self._accepts(dfa, tok, '{"xs": [1]}')
        assert self._accepts(dfa, tok, '{"xs": [1, 2, 3]}')
        assert not self._accepts(dfa, tok, '{"xs": []}')
        assert not self._accepts(dfa, tok, '{"xs": [1, 2, 3, 4]}')

    def test_trailing_optional(self):
        schema = {"type": "object",
                  "properties": {"a": {"type": "integer"},
                                 "b": {"type": "integer"}},
                  "required": ["a"]}
        dfa, tok = self._dfa(schema)
        assert self._accepts(dfa, tok, '{"a": 1}')
        assert self._accepts(dfa, tok, '{"a": 1, "b": 2}')

    def test_nested_fixed_schema(self):
        """Fixed-key nested objects are a FINITE language — still regular,
        handled by recursion (no pushdown needed)."""
        schema = {"type": "object",
                  "properties": {
                      "user": {"type": "object",
                               "properties": {"name": {"type": "string"},
                                              "age": {"type": "integer"}}},
                      "ok": {"type": "boolean"}}}
        dfa, tok = self._dfa(schema)
        assert self._accepts(
            dfa, tok, '{"user": {"name": "bo", "age": 3}, "ok": true}')
        assert not self._accepts(
            dfa, tok, '{"user": {"name": "bo"}, "ok": true}')  # missing age
        assert not self._accepts(
            dfa, tok, '{"user": "bo", "ok": true}')            # not object

    def test_freeform_object_value_rejected(self):
        """'object' without properties is unbounded → clear error."""
        with pytest.raises(ValueError, match="free-form|properties"):
            guided.regex_for_json_schema(
                {"type": "object",
                 "properties": {"o": {"type": "object"}}})

    def test_json_value_regex_mode(self):
        """Depth-bounded free-form JSON (response_format json_object)."""
        pat = guided.json_value_regex(2)
        d = guided.char_dfa_for_regex(pat)

        def match(s):
            cur = d.start
            for c in s:
                cur = d.step(cur, c)
                if cur == 0:
                    return False
            return cur in d.accept

        assert match('{"a": 1}')
        assert match('{"a": [1, {"b": "c"}], "d": null}')
        assert match('{}')
        assert not match('{"a": 1')         # unterminated
        assert not match('[1, 2]')          # top level must be an object
        assert not match('x')


CFG = tiny_llama()
PARAMS = llama.init_params(CFG, jax.random.PRNGKey(0))
GEN = GenerationConfig(greedy=True, max_new_tokens=8, eos_token_ids=(2,))


def _engine(**kw):
    return InferenceEngine(
        CFG, PARAMS,
        engine_cfg=EngineConfig(max_seq_len=64, decode_chunk=4,
                                max_batch_size=2, prefill_buckets=(8, 16),
                                page_size=8), **kw)


def _run(sched):
    while sched.step():
        pass


def _done(r, eos=2):
    """output_ids minus the terminating stop token (the scheduler appends
    it to output_ids; streams/final_text already exclude it)."""
    ids = list(r.output_ids)
    return ids[:-1] if ids and ids[-1] == eos else ids


class TestSchedulerGuided:
    @pytest.mark.parametrize("paged", [False, True])
    def test_token_choice_exact(self, paged):
        """Greedy decode constrained to token-sequence choices must emit
        exactly one of them — and pick the higher-likelihood one."""
        eng = _engine()
        cls = PagedScheduler if paged else ContinuousBatchingScheduler
        sched = cls(eng, GEN, slots=2)
        choices = [[5, 9, 11], [7, 13], [7, 13, 13]]
        r = sched.submit([1, 2, 3], guided_choice=choices)
        _run(sched)
        assert _done(r) in [list(c) for c in choices]

    def test_choice_respects_likelihood(self):
        """Between two single-token choices the greedy pick must be the
        one with the higher raw logit."""
        eng = _engine()
        # find the unconstrained greedy next token t*, then constrain to
        # {t*, other}: t* must win; constrain to {a, b} (both != t*): the
        # higher-logit of a, b must win
        base = ContinuousBatchingScheduler(eng, GEN, slots=2)
        rb = base.submit([1, 2, 3])
        _run(base)
        tstar = rb.output_ids[0]
        a, b = (tstar + 7) % CFG.vocab_size, (tstar + 19) % CFG.vocab_size
        a, b = max(a, 3), max(b, 3)
        sched = ContinuousBatchingScheduler(eng, GEN, slots=2)
        r1 = sched.submit([1, 2, 3], guided_choice=[[tstar], [a]])
        r2 = sched.submit([1, 2, 3], guided_choice=[[a], [b]])
        _run(sched)
        assert _done(r1) == [tstar]
        assert _done(r2)[0] in (a, b)

    def test_mixed_constrained_and_free(self):
        """A constrained row must not perturb an unconstrained batchmate."""
        eng = _engine()
        base = ContinuousBatchingScheduler(eng, GEN, slots=2)
        want = base.submit([3, 4, 5])
        _run(base)
        sched = ContinuousBatchingScheduler(eng, GEN, slots=2)
        free = sched.submit([3, 4, 5])
        cons = sched.submit([6, 7], guided_choice=[[9, 10], [11]])
        _run(sched)
        assert free.output_ids == want.output_ids
        assert _done(cons) in ([9, 10], [11])

    def test_two_constraints_one_batch(self):
        eng = _engine()
        sched = ContinuousBatchingScheduler(eng, GEN, slots=2)
        r1 = sched.submit([1, 2], guided_choice=[[5, 6], [8]])
        r2 = sched.submit([3, 4], guided_choice=[[10, 12, 14]])
        _run(sched)
        assert _done(r1) in ([5, 6], [8])
        assert _done(r2) == [10, 12, 14]

    def test_sampled_stays_inside_constraint(self):
        """High-temperature sampling still cannot escape the DFA."""
        eng = _engine()
        sched = ContinuousBatchingScheduler(
            eng, GenerationConfig(max_new_tokens=8, eos_token_ids=(2,)),
            slots=2)
        choices = [[5, 9], [7, 13, 15], [21]]
        rs = [sched.submit([1, 2, 3], temperature=5.0, seed=i,
                           guided_choice=choices) for i in range(4)]
        _run(sched)
        for r in rs:
            assert _done(r) in [list(c) for c in choices], r.output_ids

    def test_string_choice_via_tokenizer(self):
        class Tok:
            # id <-> piece table over single chars; ids 0..2 reserved
            pieces = ["", "<bos>", "<eos>"] + [chr(c) for c in
                                               range(97, 123)]

            def encode(self, text, add_bos=True):
                return [self.pieces.index(c) for c in text]

            def decode(self, ids):
                return "".join(self.pieces[i] for i in ids
                               if i < len(self.pieces))

            def decode_token(self, tid):
                return self.pieces[tid] if tid < len(self.pieces) else ""

        eng = _engine(tokenizer=Tok())
        sched = ContinuousBatchingScheduler(eng, GEN, slots=2)
        r = sched.submit("abc", guided_choice=["cat", "dog"])
        _run(sched)
        assert Tok().decode(_done(r)) in ("cat", "dog")

    def test_constraint_survives_preemption_replay(self):
        """Seeded replay after preemption re-derives the DFA state from
        the replayed output — the final text still matches the DFA."""
        eng = _engine()
        gen = GenerationConfig(greedy=True, max_new_tokens=8,
                               eos_token_ids=(2,))
        sched = PagedScheduler(eng, gen, slots=2)
        choice = [5, 9, 11, 13, 15, 17, 19]
        r = sched.submit([1, 2, 3], guided_choice=[choice])
        # admit + one chunk, then force a preemption mid-match
        sched.step()
        assert sched.slot_req[0] is r or sched.slot_req[1] is r
        slot = 0 if sched.slot_req[0] is r else 1
        assert sched.dstate_host[slot] >= 0     # constraint active
        sched._preempt(slot)
        assert sched.dstate_host[slot] == -1
        _run(sched)
        assert _done(r) == choice

    def test_json_mode_stream_stays_on_grammar(self):
        """Free-form JSON mode through the scheduler: every emitted token
        must be a legal DFA move (the full output may be cut by the token
        budget — length cap wins, as in every serving engine)."""
        class Tok:
            pieces = ["", "<bos>", "<eos>"] + list(' {}[]:,"-.0123456789'
                                                   'abcdeftruenls')

            def encode(self, text, add_bos=True):
                return [self.pieces.index(c) for c in text]

            def decode(self, ids):
                return "".join(self.pieces[i] for i in ids
                               if 0 <= i < len(self.pieces))

            def decode_token(self, tid):
                return (self.pieces[tid] if 0 <= tid < len(self.pieces)
                        else "")

        eng = _engine(tokenizer=Tok())
        gen = GenerationConfig(max_new_tokens=12, eos_token_ids=(2,))
        sched = ContinuousBatchingScheduler(eng, gen, slots=2)
        pat = guided.json_value_regex(1)
        r = sched.submit("ab", temperature=3.0, seed=7, guided_regex=pat)
        _run(sched)
        dfa = guided.dfa_for_regex(pat, Tok(), CFG.vocab_size, [2])
        s = dfa.start
        for t in r.output_ids:
            assert dfa.mask[s, t], (r.output_ids, t)
            s = int(dfa.trans[s, t])

    def test_unknown_vocab_rejected(self):
        eng = _engine()
        sched = ContinuousBatchingScheduler(eng, GEN, slots=2)
        with pytest.raises(ValueError, match="out of range"):
            sched.submit([1, 2], guided_choice=[[CFG.vocab_size + 5]])
        with pytest.raises(ValueError, match="exactly one"):
            sched.submit([1, 2], guided_choice=[[5]], guided_regex="a+")
        with pytest.raises(ValueError, match="tokenizer"):
            sched.submit([1, 2], guided_regex="a+")


class TestSchedulerLogitBias:
    def test_bias_forces_token(self):
        """A huge positive bias makes greedy pick that token every step."""
        eng = _engine()
        sched = ContinuousBatchingScheduler(eng, GEN, slots=2)
        tid = 17
        r = sched.submit([1, 2, 3], logit_bias={tid: 100.0})
        _run(sched)
        assert all(t == tid for t in r.output_ids), r.output_ids

    def test_negative_bias_banning(self):
        """-100 on the unconstrained greedy choice bans it (OpenAI
        semantics) without touching a bias-free batchmate."""
        eng = _engine()
        base = ContinuousBatchingScheduler(eng, GEN, slots=2)
        rb = base.submit([1, 2, 3])
        _run(base)
        banned = rb.output_ids[0]
        sched = ContinuousBatchingScheduler(eng, GEN, slots=2)
        r = sched.submit([1, 2, 3], logit_bias={banned: -1000.0})
        free = sched.submit([1, 2, 3])
        _run(sched)
        assert r.output_ids[0] != banned
        assert free.output_ids == rb.output_ids

    def test_bias_ids_validated(self):
        eng = _engine()
        sched = ContinuousBatchingScheduler(eng, GEN, slots=2)
        with pytest.raises(ValueError, match="out of range"):
            sched.submit([1, 2], logit_bias={10 ** 6: 1.0})

    def test_generate_logit_bias(self):
        """The offline path: GenerationConfig.logit_bias drives
        engine.generate the same way."""
        eng = _engine()
        tid = 23
        gen = GenerationConfig(greedy=True, max_new_tokens=4,
                               eos_token_ids=(), logit_bias={tid: 100.0})
        out = eng.generate([[1, 2, 3]], gen)[0]
        assert out.token_ids == [tid] * 4


class TestReviewRegressions:
    def test_stale_bias_row_not_inherited(self):
        """A finished request's logit_bias row must not leak into the next
        occupant of its slot while another biased request is live."""
        eng = _engine()
        gen = GenerationConfig(greedy=True, max_new_tokens=6,
                               eos_token_ids=())
        base = ContinuousBatchingScheduler(eng, gen, slots=2)
        want = base.submit([3, 4, 5])
        _run(base)
        sched = ContinuousBatchingScheduler(eng, gen, slots=2)
        # short biased request occupies a slot and finishes fast
        a = sched.submit([9, 10], max_new_tokens=1, logit_bias={17: 100.0})
        # long-running biased request keeps use_bias True afterwards
        b = sched.submit([11, 12], logit_bias={23: 100.0})
        sched.step()                       # admits both, decodes
        # unbiased request lands in the retired slot of `a`
        c = sched.submit([3, 4, 5])
        _run(sched)
        assert a.output_ids == [17]
        assert all(t == 23 for t in b.output_ids)
        assert c.output_ids == want.output_ids, (
            "stale bias row leaked into the reused slot")

    def test_all_optional_json_never_emits_leading_comma(self):
        """Skipping the first optional property must not allow '{,'."""
        import json as _json
        schema = {"type": "object",
                  "properties": {"a": {"type": "integer"},
                                 "b": {"type": "integer"}},
                  "required": []}
        pat = guided.regex_for_json_schema(schema)
        d = guided.char_dfa_for_regex(pat)

        def match(s):
            cur = d.start
            for ch in s:
                cur = d.step(cur, ch)
                if cur == 0:
                    return False
            return cur in d.accept

        for ok in ('{}', '{"a": 1}', '{"b": 2}', '{"a": 1, "b": 2}'):
            assert match(ok), ok
            _json.loads(ok)
        for bad in ('{, "b": 2}', '{"b": 2, "a": 1}', '{"a": 1,}'):
            assert not match(bad), bad

    def test_unsatisfiable_constraint_rejected_at_submit(self):
        eng = _engine()
        sched = ContinuousBatchingScheduler(eng, GEN, slots=2)

        class Tok:
            def decode_token(self, t):
                return "a"      # vocabulary can never produce 'z'

            def decode(self, ids):
                return "a" * len(ids)

            def encode(self, text, add_bos=True):
                return [3]
        eng2 = _engine(tokenizer=Tok())
        s2 = ContinuousBatchingScheduler(eng2, GEN, slots=2)
        with pytest.raises(ValueError, match="unsatisfiable"):
            s2.submit([1, 2], guided_regex="z+")

    def test_oversized_table_rejected_at_submit(self):
        """Registration-time table-size errors surface to the SUBMITTING
        caller (a raise in the scheduler loop would hang the server)."""
        eng = _engine()
        sched = ContinuousBatchingScheduler(eng, GEN, slots=2)
        old = sched._register_dfa

        def boom(dfa):
            raise ValueError("guided-decoding tables would need too much")
        sched._register_dfa = boom
        with pytest.raises(ValueError, match="tables"):
            sched.submit([1, 2], guided_choice=[[5, 6]])
        sched._register_dfa = old


class TestReviewRegressions2:
    def test_zero_repeat_quantifier(self):
        """a{0} / {0,0} must match exactly the empty string (it used to
        compile to 0-or-1)."""
        d = guided.char_dfa_for_regex("a{0}b")
        def match(dfa, s):
            cur = dfa.start
            for c in s:
                cur = dfa.step(cur, c)
                if cur == 0:
                    return False
            return cur in dfa.accept
        assert match(d, "b") and not match(d, "ab")
        # reachable from schemas: maxItems == 1 must reject 2 elements
        schema = {"type": "object",
                  "properties": {"xs": {"type": "array",
                                        "items": {"type": "integer"},
                                        "minItems": 1, "maxItems": 1}}}
        pat = guided.regex_for_json_schema(schema)
        d2 = guided.char_dfa_for_regex(pat)
        assert match(d2, '{"xs": [1]}')
        assert not match(d2, '{"xs": [1, 2]}')

    def test_failed_registration_does_not_poison_registry(self):
        """A constraint whose tables exceed the size guard must raise on
        EVERY submit (a cached-but-tableless registration would decode
        unconstrained on retry)."""
        eng = _engine()
        sched = ContinuousBatchingScheduler(eng, GEN, slots=2)
        import llm_inference_tpu.engine.scheduler as S
        dfa = guided.from_token_sequences([[5, 6]], CFG.vocab_size, [2])
        big = guided.TokenDFA(
            trans=np.zeros((512, CFG.vocab_size), np.int32),
            mask=np.zeros((512, CFG.vocab_size), bool), start=1)
        old_cap = S.GUIDED_TABLE_MAX_ENTRIES
        S.GUIDED_TABLE_MAX_ENTRIES = 64 * CFG.vocab_size   # force the guard
        try:
            with pytest.raises(ValueError, match="tables"):
                sched._register_dfa(big)
        finally:
            S.GUIDED_TABLE_MAX_ENTRIES = old_cap
        # the failed constraint must NOT be in the registry
        assert big.key() not in sched._dfa_key2idx
        # and a legitimate constraint still registers + builds tables
        idx = sched._register_dfa(dfa)
        assert sched._gmask_dev is not None
        assert sched._gmask_dev.shape[0] >= idx + 1
