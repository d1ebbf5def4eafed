"""Continuous batching (runtime/continuous.py) correctness.

The load-bearing invariant: a request spliced into a lane mid-session at
cache columns [p-P, p) must generate EXACTLY what a fresh run at columns
[0, P) generates — RoPE is relative (rotary shift invariance) and the
per-lane `start` mask hides the previous occupant's stale cache. Greedy
codes are the gate (CLAUDE.md: chained-hidden cosine is chaotic; discrete
codes are stable for same-math perturbations of zero — and here the math
is exact, only the absolute positions differ).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qwen3tts_tpu.config import tiny_pipeline_config
from qwen3tts_tpu.models import code_predictor as CP
from qwen3tts_tpu.models import talker as T
from qwen3tts_tpu.runtime import continuous as cont
from qwen3tts_tpu.runtime import decode_loop as DL

CFG = tiny_pipeline_config()
TCFG, CCFG = CFG.talker, CFG.code_predictor
H = TCFG.hidden_size


@pytest.fixture(scope="module")
def params():
    tp = T.init_talker_params(jax.random.PRNGKey(21), TCFG, jnp.float32)
    cp = CP.init_code_predictor_params(jax.random.PRNGKey(22), CCFG, jnp.float32)
    return tp, cp


def _requests():
    """Unequal prompts and frame budgets — staggered finishes force
    mid-session refills at several distinct splice points."""
    reqs = []
    for i, (ntok, budget) in enumerate(
            [(11, 4), (12, 6), (10, 3), (13, 5), (11, 2), (12, 4)]):
        tokens = (np.arange(ntok, dtype=np.int32) * (i + 3)) % 50 + 2
        reqs.append(dict(tokens=tokens, n_tokens=ntok, budget=budget,
                         seed=100 + i))
    return reqs


def _fresh(tp, cp, req, *, temperature, top_k, Tb=16):
    padded = np.zeros((Tb,), np.int32)
    padded[:req["n_tokens"]] = req["tokens"]
    res = DL.generate_from_tokens(
        tp, cp, jnp.asarray(padded), jnp.int32(req["n_tokens"]),
        jnp.zeros((H,), jnp.float32), jnp.int32(TCFG.english_language_id),
        jax.random.PRNGKey(req["seed"]),
        talker_cfg=TCFG, cp_cfg=CCFG, max_frames=req["budget"],
        kv_capacity=10 + req["budget"] + 8, temperature=temperature,
        top_k=top_k, repetition_penalty=1.05, allow_eos=False)
    n = int(res.n_frames)
    return np.asarray(res.codes[:n])


def _run_continuous(tp, cp, reqs, *, temperature, top_k, lanes=2,
                    kv_capacity=28, chunk_frames=2, refill_slots=2,
                    compact_threshold=128, compact_policy="pressure"):
    sched = cont.ContinuousScheduler(
        tp, cp, TCFG, CCFG, lanes=lanes, kv_capacity=kv_capacity,
        text_bucket=16, chunk_frames=chunk_frames,
        refill_slots=refill_slots, max_frames=8, temperature=temperature,
        top_k=top_k, repetition_penalty=1.05, allow_eos=False,
        compact_threshold=compact_threshold, compact_policy=compact_policy)
    rids = [sched.submit(r["tokens"], r["n_tokens"], np.zeros((H,)),
                         TCFG.english_language_id, seed=r["seed"],
                         max_frames=r["budget"]) for r in reqs]
    results = sched.run()
    sched.check_host_mirrors()   # host n_past/start/done == device state
    return sched, [results[rid] for rid in rids]


def test_continuous_greedy_matches_fresh_runs(params):
    """Every request through the 2-lane continuous scheduler (staggered
    refills, tight capacity forcing >=1 session reset) emits exactly the
    codes a fresh single-stream greedy run emits."""
    tp, cp = params
    reqs = _requests()
    sched, got = _run_continuous(tp, cp, reqs, temperature=0.0, top_k=0)
    assert sched.sessions + sched.compactions >= 1, (
        "test config should be tight enough to hit the capacity path "
        f"(n_past={int(sched.state.n_past)}, C={sched.C})")
    for r, codes in zip(reqs, got):
        want = _fresh(tp, cp, r, temperature=0.0, top_k=0)
        assert codes.shape == want.shape == (r["budget"], TCFG.n_codebooks)
        np.testing.assert_array_equal(codes, want)


def test_compaction_is_exact(params):
    """Rolling compaction (roll + K re-rotation by -shift) mid-request must
    not change any request's codes: run a queue long enough to force
    compactions while lanes are mid-generation and compare every result
    against fresh runs."""
    tp, cp = params
    reqs = _requests() + [dict(r, seed=r["seed"] + 50) for r in _requests()]
    sched, got = _run_continuous(tp, cp, reqs, temperature=0.0, top_k=0,
                                 kv_capacity=32)
    assert sched.compactions >= 1, (
        f"expected compactions (sessions={sched.sessions}, "
        f"n_past={int(sched.state.n_past)})")
    for r, codes in zip(reqs, got):
        want = _fresh(tp, cp, r, temperature=0.0, top_k=0)
        np.testing.assert_array_equal(codes, want)


def test_opportunistic_compaction_is_exact(params):
    """compact_policy="opportunistic" (shift >= compact_threshold, no
    capacity pressure — an opt-in correctness stressor; the default policy
    is pressure-only since the r4 hardware session measured opportunistic
    shifts as pure overhead): with a threshold far below capacity,
    compactions must fire during the normal refill loop — not only on the
    pressure path — and every request must still match its fresh run
    exactly. Default test capacities (28-32) never reach the default
    threshold of 128, so this is the only coverage of the opportunistic
    trigger + refill interplay."""
    tp, cp = params
    reqs = _requests()
    sched, got = _run_continuous(tp, cp, reqs, temperature=0.0, top_k=0,
                                 kv_capacity=64, compact_threshold=4,
                                 compact_policy="opportunistic")
    # capacity 64 is roomy for this mix: every compaction here must be
    # opportunistic (pressure needs n_past + max_frames + K > C)
    assert sched.compactions >= 1, (
        f"opportunistic trigger never fired (threshold=4, "
        f"n_past={int(sched.state.n_past)}, sessions={sched.sessions})")
    assert sched.sessions == 0, "capacity 64 should never need a reset"
    for r, codes in zip(reqs, got):
        want = _fresh(tp, cp, r, temperature=0.0, top_k=0)
        np.testing.assert_array_equal(codes, want)


def test_pressure_policy_never_compacts_when_roomy(params):
    """The default compact_policy="pressure" must NOT compact (or reset)
    when capacity never blocks admission, even with a tiny
    compact_threshold — compaction exists solely to reclaim admission
    capacity (a global shift cannot shrink the kernel's DMA window), so
    firing it on a roomy cache is pure overhead (184 ms/call on v5e)."""
    tp, cp = params
    reqs = _requests()
    sched, got = _run_continuous(tp, cp, reqs, temperature=0.0, top_k=0,
                                 kv_capacity=64, compact_threshold=4)
    assert sched.compactions == 0, (
        f"pressure policy compacted a roomy cache "
        f"(compactions={sched.compactions})")
    assert sched.sessions == 0
    for r, codes in zip(reqs, got):
        want = _fresh(tp, cp, r, temperature=0.0, top_k=0)
        np.testing.assert_array_equal(codes, want)


def test_bulk_refill_is_exact(params):
    """When more lanes are idle than refill_slots, _do_refill switches to
    ONE bulk dispatch at R=B (the initial fill of a 64-lane server used to
    issue 8 sequential refill programs). The bulk program must splice
    identically to the R-slot one: every request still matches its fresh
    single-stream run."""
    tp, cp = params
    reqs = _requests()
    sched, got = _run_continuous(tp, cp, reqs, temperature=0.0, top_k=0,
                                 lanes=4, refill_slots=1, kv_capacity=48)
    # 4 idle lanes, 6 queued, R=1 => the first boundary must bulk-fill
    for r, codes in zip(reqs, got):
        want = _fresh(tp, cp, r, temperature=0.0, top_k=0)
        np.testing.assert_array_equal(codes, want)


def test_continuous_sampled_matches_fresh_runs(params):
    """Sampled decoding: the per-request key chain (fresh key at refill,
    (key, k_cb0, k_cp) split per frame) reproduces the single-stream
    sampled output for every request."""
    tp, cp = params
    reqs = _requests()[:4]
    _, got = _run_continuous(tp, cp, reqs, temperature=0.9, top_k=50)
    for r, codes in zip(reqs, got):
        want = _fresh(tp, cp, r, temperature=0.9, top_k=50)
        np.testing.assert_array_equal(codes, want)


def test_refill_masks_previous_occupant(params):
    """A lane's second occupant must not see the first one's cache: run the
    same request as lane 0's first and second occupant — identical codes."""
    tp, cp = params
    req = _requests()[0]
    # twice the same request, one lane: second run is spliced at p > 10
    sched, got = _run_continuous(
        tp, cp, [req, dict(req)], temperature=0.0, top_k=0, lanes=1,
        refill_slots=1)
    np.testing.assert_array_equal(got[0], got[1])
    want = _fresh(tp, cp, req, temperature=0.0, top_k=0)
    np.testing.assert_array_equal(got[0], want)


def test_budget_and_emit_accounting(params):
    """Emissions per request == its budget (allow_eos=False); chunks keep
    lockstep (every chunk advances n_past by chunk_frames)."""
    tp, cp = params
    reqs = _requests()[:3]
    sched, got = _run_continuous(tp, cp, reqs, temperature=0.0, top_k=0)
    for r, codes in zip(reqs, got):
        assert codes.shape[0] == r["budget"]
        assert (codes[:, 0] >= 0).all()
        assert (codes[:, 0] < TCFG.codec_vocab_size).all()
        assert (codes[:, 1:] < CCFG.vocab_size).all()


def test_per_request_sampling_params(params):
    """Each request carries its own temperature/top_p/repetition_penalty
    through state.samp: results must equal fresh single-stream runs with
    those exact values, all inside ONE compiled chunk program."""
    tp, cp = params
    overrides = [dict(temperature=0.7, repetition_penalty=1.0),
                 dict(temperature=1.3, repetition_penalty=1.3),
                 dict(temperature=0.9, top_p=0.8),
                 dict()]
    reqs = _requests()[:4]

    sched = cont.ContinuousScheduler(
        tp, cp, TCFG, CCFG, lanes=2, kv_capacity=28, text_bucket=16,
        chunk_frames=2, refill_slots=2, max_frames=8, temperature=0.9,
        top_k=50, top_p=0.95, repetition_penalty=1.05, allow_eos=False)
    rids = [sched.submit(r["tokens"], r["n_tokens"], np.zeros((H,)),
                         TCFG.english_language_id, seed=r["seed"],
                         max_frames=r["budget"], **ov)
            for r, ov in zip(reqs, overrides)]
    results = sched.run()

    for r, ov, rid in zip(reqs, overrides, rids):
        padded = np.zeros((16,), np.int32)
        padded[:r["n_tokens"]] = r["tokens"]
        want = DL.generate_from_tokens(
            tp, cp, jnp.asarray(padded), jnp.int32(r["n_tokens"]),
            jnp.zeros((H,), jnp.float32),
            jnp.int32(TCFG.english_language_id),
            jax.random.PRNGKey(r["seed"]), talker_cfg=TCFG, cp_cfg=CCFG,
            max_frames=r["budget"], kv_capacity=10 + r["budget"] + 8,
            temperature=ov.get("temperature", 0.9), top_k=50,
            top_p=ov.get("top_p", 0.95),
            repetition_penalty=ov.get("repetition_penalty", 1.05),
            allow_eos=False, greedy=False, use_top_p=True)
        n = int(want.n_frames)
        np.testing.assert_array_equal(results[rid],
                                      np.asarray(want.codes[:n]))

    # class-consistency guards
    with pytest.raises(AssertionError):
        sched.submit(reqs[0]["tokens"], reqs[0]["n_tokens"],
                     np.zeros((H,)), TCFG.english_language_id,
                     temperature=0.0)   # greedy override on a sampled server


def test_continuous_fused_kernel_path_greedy(params):
    """The production path: int8 blocks + fused cp/talker kernels with the
    in-kernel cb0 epilogue and the per-lane `start` column mask (interpret
    mode on CPU). Greedy codes for spliced requests must match fresh fused
    single-stream runs — this exercises start= through
    fused_talker_step_batched and the kernel's min-start DMA skip."""
    from qwen3tts_tpu.ops.quant import quantize_block_params

    tp, cp = params
    tpq = tp._replace(blocks=quantize_block_params(tp.blocks))
    cpq = cp._replace(blocks=quantize_block_params(cp.blocks))
    reqs = [dict(tokens=np.arange(11, dtype=np.int32) + 2, n_tokens=11,
                 budget=2, seed=7),
            dict(tokens=(np.arange(12, dtype=np.int32) * 5) % 40 + 2,
                 n_tokens=12, budget=3, seed=8),
            dict(tokens=np.arange(10, dtype=np.int32) + 4, n_tokens=10,
                 budget=2, seed=9),
            dict(tokens=(np.arange(13, dtype=np.int32) * 3) % 30 + 2,
                 n_tokens=13, budget=4, seed=10),
            dict(tokens=np.arange(12, dtype=np.int32) + 6, n_tokens=12,
                 budget=2, seed=11),
            dict(tokens=np.arange(11, dtype=np.int32) + 8, n_tokens=11,
                 budget=3, seed=12),
            dict(tokens=(np.arange(10, dtype=np.int32) * 7) % 25 + 2,
                 n_tokens=10, budget=4, seed=13),
            dict(tokens=np.arange(12, dtype=np.int32) + 3, n_tokens=12,
                 budget=2, seed=14)]

    sched = cont.ContinuousScheduler(
        tpq, cpq, TCFG, CCFG, lanes=2, kv_capacity=20, text_bucket=16,
        chunk_frames=2, refill_slots=2, max_frames=4, temperature=0.0,
        top_k=0, repetition_penalty=1.05, allow_eos=False,
        fused_cp=True, fused_talker=True)
    assert sched.kernel_cb0, "fused talker should resolve the cb0 epilogue"
    rids = [sched.submit(r["tokens"], r["n_tokens"], np.zeros((H,)),
                         TCFG.english_language_id, seed=r["seed"],
                         max_frames=r["budget"]) for r in reqs]
    results = sched.run()
    assert sched.compactions >= 1, (
        "C=20 should force compaction mid-flight through the kernel loop "
        f"(sessions={sched.sessions}, n_past={int(sched.state.n_past)})")

    for r, rid in zip(reqs, rids):
        padded = np.zeros((16,), np.int32)
        padded[:r["n_tokens"]] = r["tokens"]
        want = DL.generate_from_tokens(
            tpq, cpq, jnp.asarray(padded), jnp.int32(r["n_tokens"]),
            jnp.zeros((H,), jnp.float32),
            jnp.int32(TCFG.english_language_id),
            jax.random.PRNGKey(r["seed"]), talker_cfg=TCFG, cp_cfg=CCFG,
            max_frames=r["budget"], kv_capacity=32, temperature=0.0,
            top_k=0, repetition_penalty=1.05, allow_eos=False,
            fused_cp=True, fused_talker=True)
        n = int(want.n_frames)
        np.testing.assert_array_equal(results[rid], np.asarray(want.codes[:n]))


def test_state_shapes_and_reset(params):
    tp, cp = params
    st = cont.init_state(tp, TCFG, lanes=4, kv_capacity=32, trailing_len=13)
    assert st.kv.shape == (4, TCFG.n_layers, 2, TCFG.n_kv_heads, 32,
                           TCFG.head_dim)
    assert bool(st.done.all())
    assert int(st.n_past) == cont.prefill_window_len(False) == 10
    assert cont.prefill_window_len(True) == 9


def test_host_prngkey_matches_jax():
    """_do_refill builds per-request keys on the HOST (the jax.random.
    PRNGKey device round trip cost ~5 s / 192 requests over the tunnel);
    the host bytes must equal jax's threefry key data exactly."""
    for seed in (0, 1, 42, 1000, 2**31 - 1, 2**31, 2**32 - 1):
        np.testing.assert_array_equal(
            cont._host_prngkey(seed), np.asarray(jax.random.PRNGKey(seed)),
            err_msg=f"seed {seed}")


def test_feeder_online_arrivals_match_fresh_runs(params):
    """run(feeder=...) models online arrivals: requests are submitted
    mid-run (here keyed to chunks_run so the test is deterministic), the
    loop idles on an empty queue while arrivals are pending instead of
    exiting, and every request still emits exactly its fresh-run codes."""
    tp, cp = params
    reqs = _requests()
    sched = cont.ContinuousScheduler(
        tp, cp, TCFG, CCFG, lanes=2, kv_capacity=28, text_bucket=16,
        chunk_frames=2, refill_slots=2, max_frames=8, temperature=0.0,
        top_k=0, repetition_penalty=1.05, allow_eos=False)
    rids = {}
    release_at = [0, 0, 1, 3, 6, 9]   # arrival "times" in chunks_run units
    state = {"next": 0, "idle_calls": 0}

    def feeder(idle):
        if idle:
            state["idle_calls"] += 1
            # the run-loop contract: on idle a real-time feeder BLOCKS until
            # its next arrival. This feeder keys releases to chunks_run
            # (deterministic), which freezes when everything idles — so
            # "blocking" here is jumping the clock to the next release
            # (otherwise the loop would spin; the overlapped loop's delayed
            # refills reach the all-idle state on trajectories the serial
            # loop didn't).
            if state["next"] < len(reqs):
                release_at[state["next"]] = sched.chunks_run
        while (state["next"] < len(reqs)
               and release_at[state["next"]] <= sched.chunks_run):
            r = reqs[state["next"]]
            rids[state["next"]] = sched.submit(
                r["tokens"], r["n_tokens"], np.zeros((H,)),
                TCFG.english_language_id, seed=r["seed"],
                max_frames=r["budget"])
            state["next"] += 1
        return state["next"] < len(reqs)

    results = sched.run(feeder=feeder)
    sched.check_host_mirrors()
    assert state["next"] == len(reqs), "feeder exhausted all arrivals"
    for i, r in enumerate(reqs):
        want = _fresh(tp, cp, r, temperature=0.0, top_k=0)
        np.testing.assert_array_equal(results[rids[i]], want)


def test_overlap_harvest_matches_serial(params):
    """The overlapped run loop (one chunk in flight, refill decisions one
    chunk stale — roadmap r4 #2) must produce EXACTLY the serial loop's
    per-request codes on the same submissions, greedy and sampled, and
    still leave host mirrors == device state after the drain."""
    tp, cp = params
    reqs = _requests()
    for temperature, top_k in ((0.0, 0), (0.9, 5)):
        outs = {}
        for overlap in (False, True):
            sched = cont.ContinuousScheduler(
                tp, cp, TCFG, CCFG, lanes=2, kv_capacity=28, text_bucket=16,
                chunk_frames=2, refill_slots=2, max_frames=8,
                temperature=temperature, top_k=top_k,
                repetition_penalty=1.05, allow_eos=False,
                overlap_harvest=overlap)
            assert sched.overlap_harvest is overlap
            rids = [sched.submit(r["tokens"], r["n_tokens"], np.zeros((H,)),
                                 TCFG.english_language_id, seed=r["seed"],
                                 max_frames=r["budget"]) for r in reqs]
            results = sched.run()
            sched.check_host_mirrors()
            outs[overlap] = [results[rid] for rid in rids]
        for a, b in zip(outs[False], outs[True]):
            np.testing.assert_array_equal(a, b)
