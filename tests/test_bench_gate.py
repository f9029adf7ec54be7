"""Unit tests for bench.py's probe-gated headline draw scheduler.

The scheduler is plain host logic once the probe, the pass, and the
clock are stubbed, so it can be exercised hermetically.  Invariants:
(a) the first two draws are unconditional, (b) slow-phase probes skip
draws, (c) a fast-phase probe triggers a draw immediately, (d) the
reality-check forces a draw even when the gate keeps saying no,
(e) the draw-time budget caps spend.
"""

import importlib.util
import os

import pytest


@pytest.fixture()
def bench(monkeypatch):
    spec = importlib.util.spec_from_file_location(
        'bench_under_test',
        os.path.join(os.path.dirname(__file__), '..', 'bench.py'))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    monkeypatch.setattr(mod, 'GATE_SLEEP_S', 2.0)
    monkeypatch.setattr(mod, 'TIME_BUDGET', 1e9)
    monkeypatch.setattr(mod, 'WALL_BUDGET', 1e9)
    return mod


def _pass_time(bw):
    # the round-3 finding: the engine pass runs at raw-link speed, so
    # pass time = bytes / bw + ~1 s fixed (250 MB corpus here)
    return 250.0 / bw + 1.0


def _ws(bench, **alts):
    """Fresh single-primary wireset dict (250 MiB q6 pass), plus
    optional alternates given as wire=mib pairs."""
    d = {'q6': ('q6', None, 250 * 2**20)}
    for w, mib in alts.items():
        d[w] = (w, None, int(mib * 2**20))
    return d


def _stub(bench, monkeypatch, probe_bws, max_repeats=6, reality_s=1e9):
    """Scripted probe sequence + simulated clock.  The fake pass's
    duration tracks the CURRENT probe reading; sleeps advance the
    simulated clock so wall budgets stay meaningful."""
    state = {'bw': probe_bws[0], 'probes': 0, 'passes': [], 't': 1000.0}

    def fake_now():
        state['t'] += 1e-4
        return state['t']

    def fake_sleep(s):
        state['t'] += s

    def fake_probe(mb=8):
        i = min(state['probes'], len(probe_bws) - 1)
        state['bw'] = probe_bws[i]
        state['probes'] += 1
        return state['bw']

    def fake_pass(engine, paths, read, names, tel=None, **kw):
        if tel is not None:
            tel.update(bytes_h2d=250_000_000)
        state['passes'].append(state['bw'])
        state['wires'] = state.get('wires', []) + [paths]
        state['t'] += _pass_time(state['bw'])
        return {'clip': []}, []

    monkeypatch.setattr(bench, '_now', fake_now)
    monkeypatch.setattr(bench, '_sleep', fake_sleep)
    monkeypatch.setattr(bench, 'measure_raw_link_mb_s', fake_probe)
    monkeypatch.setattr(bench, 'run_pass', fake_pass)
    monkeypatch.setattr(bench, 'MAX_REPEATS', max_repeats)
    monkeypatch.setattr(bench, 'REALITY_CHECK_S', reality_s)
    return state


def test_first_two_draws_unconditional_no_probe(bench, monkeypatch):
    state = _stub(bench, monkeypatch, [20.0], max_repeats=2)
    times, tels, wires_d, events, probes = bench.gated_headline_draws(
        None, _ws(bench), None, lambda m: None)
    assert len(times) == 2
    assert state['probes'] == 0          # gate never consulted
    assert events == {'clip': []}
    assert all(12 < t < 15 for t in times)   # slow-phase pass times


def test_slow_probes_skip_then_fast_probe_draws(bench, monkeypatch):
    # 2 unconditional draws at 20 MB/s, then slow probes (no draws),
    # then a fast phase arrives and the gate spends a draw on it
    monkeypatch.setenv('_', '_')
    state = _stub(bench, monkeypatch,
                  [20.0, 20.0, 20.0, 500.0], max_repeats=8)
    monkeypatch.setattr(bench, 'WALL_BUDGET', 60.0)
    msgs = []
    times, tels, wires_d, events, probes = bench.gated_headline_draws(
        None, _ws(bench), None, msgs.append)
    assert state['passes'][:2] == [20.0, 20.0]
    assert 500.0 in state['passes']      # the fast window was spent on
    assert min(times) < 2.0              # ~1.5 s fast draw recorded
    assert max(times) > 12.0             # slow draws recorded too
    assert any('gate probe' in m for m in msgs)
    # the fast draw pushes best clips/s past BENCH_TARGET, so the hunt
    # ends through the decisive-win exit rather than the wall budget
    assert any('target' in m for m in msgs)


def test_reality_check_forces_draw_during_slow_phase(bench, monkeypatch):
    # gate would skip forever at a uniform slow phase; with the
    # reality-check window at 0 every probe forces a draw anyway
    state = _stub(bench, monkeypatch, [20.0], max_repeats=4,
                  reality_s=0.0)
    times, _, _, _, _ = bench.gated_headline_draws(
        None, _ws(bench), None, lambda m: None)
    assert len(times) == 4


def test_dead_phase_first_draw_not_ratified(bench, monkeypatch):
    # a 0.6 MB/s dead-phase draw takes ~417 s — longer than the whole
    # wall budget — so the second unconditional draw must be skipped
    state = _stub(bench, monkeypatch, [0.6], max_repeats=8)
    monkeypatch.setattr(bench, 'WALL_BUDGET', 360.0)
    msgs = []
    times, _, _, _, _ = bench.gated_headline_draws(
        None, _ws(bench), None, msgs.append)
    assert len(times) == 1
    assert any('wall budget' in m for m in msgs)


def test_draw_time_budget_caps_spend(bench, monkeypatch):
    state = _stub(bench, monkeypatch, [20.0], max_repeats=24,
                  reality_s=0.0)
    monkeypatch.setattr(bench, 'TIME_BUDGET', 30.0)
    times, _, _, _, _ = bench.gated_headline_draws(
        None, _ws(bench), None, lambda m: None)
    # ~13.5 s/draw: 2 unconditional, then the gate stops at >= 30 s
    assert len(times) == 3


def _stub_sized(bench, monkeypatch, seq8, seq32, pass_bws,
                max_repeats=8, reality_s=1e9):
    """Size-aware probe scripting for the ramp-escalation gate: probes
    pop from per-size queues (last element repeats); pass durations
    follow the scripted pass_bws sequence, not the probe reading."""
    state = {'q': {8: list(seq8), 32: list(seq32)},
             'passes': [], 't': 1000.0, 'probe_calls': []}

    def fake_now():
        state['t'] += 1e-4
        return state['t']

    def fake_sleep(s):
        state['t'] += s

    def fake_probe(mb=8):
        q = state['q'][mb]
        bw = q.pop(0) if len(q) > 1 else q[0]
        state['probe_calls'].append((mb, bw))
        return bw

    def fake_pass(engine, paths, read, names, tel=None, **kw):
        if tel is not None:
            tel.update(bytes_h2d=250_000_000)
        i = len(state['passes'])
        bw = pass_bws[min(i, len(pass_bws) - 1)]
        state['passes'].append(bw)
        state['t'] += 250.0 / bw + 1.0
        return {'clip': []}, []

    monkeypatch.setattr(bench, '_now', fake_now)
    monkeypatch.setattr(bench, '_sleep', fake_sleep)
    monkeypatch.setattr(bench, 'measure_raw_link_mb_s', fake_probe)
    monkeypatch.setattr(bench, 'run_pass', fake_pass)
    monkeypatch.setattr(bench, 'MAX_REPEATS', max_repeats)
    monkeypatch.setattr(bench, 'REALITY_CHECK_S', reality_s)
    return state


def test_ramp_escalation_rescues_a_ramping_phase(bench, monkeypatch):
    # Two unconditional draws at 100 MB/s set best ~3.5 s.  Then the
    # 8 MB probe reads 46 MB/s — the 19 Aug ramp-onset signature.  On
    # the 8 MB reading alone est = 250/46 + 1.2 = 6.6 s >= 3.43 and the
    # gate would SKIP the phase; the escalated 32 MB probe sees the
    # ramp (450 MB/s), est = 1.76 s, and the draw is spent.
    state = _stub_sized(bench, monkeypatch,
                        seq8=[46.0], seq32=[450.0],
                        pass_bws=[100.0, 100.0, 450.0], max_repeats=3)
    times, _, _, _, _ = bench.gated_headline_draws(
        None, _ws(bench), None, lambda m: None)
    assert len(times) == 3
    assert min(times) < 2.0                     # the fast draw landed
    assert (32, 450.0) in state['probe_calls']  # escalation happened


def test_no_escalation_below_threshold(bench, monkeypatch):
    # flat slow phase: 8 MB probes read 36 MB/s (< the 42 MB/s ramp
    # threshold) — the gate must never pay for a 32 MB probe
    state = _stub_sized(bench, monkeypatch,
                        seq8=[36.0], seq32=[9999.0],
                        pass_bws=[36.0], max_repeats=8)
    monkeypatch.setattr(bench, 'WALL_BUDGET', 120.0)
    times, _, _, _, _ = bench.gated_headline_draws(
        None, _ws(bench), None, lambda m: None)
    assert all(mb == 8 for mb, _ in state['probe_calls'])
    assert len(times) == 2                      # gate skipped the rest


def test_target_hit_stops_draws_early(bench, monkeypatch):
    # draws keep improving through a burst; once best clips/s passes
    # BENCH_TARGET with >= 3 draws recorded, the hunt stops without
    # spending the remaining repeats
    state = _stub_sized(bench, monkeypatch,
                        seq8=[1000.0], seq32=[1000.0],
                        pass_bws=[300.0, 400.0, 600.0, 600.0],
                        max_repeats=8)
    monkeypatch.setattr(bench, 'TARGET_CLIPS_S', 1100.0)
    msgs = []
    times, _, _, _, _ = bench.gated_headline_draws(
        None, _ws(bench), None, msgs.append)
    assert len(times) == 3
    assert any('target' in m for m in msgs)


def test_no_unbounded_arrays_in_draw_telemetry(bench, monkeypatch):
    # round-3 regression: probe history must never ride the per-draw
    # telemetry dicts (it made the official headline line unparseable)
    state = _stub(bench, monkeypatch, [20.0, 20.0, 500.0], max_repeats=4)
    times, tels, wires_d, events, probes = bench.gated_headline_draws(
        None, _ws(bench), None, lambda m: None)
    for t in tels:
        assert 'gate_probes_mb_s' not in t
        for v in t.values():
            assert not (isinstance(v, (list, tuple)) and len(v) > 4)
    # the history IS returned, size-tagged, for stderr reporting
    assert all(isinstance(pr, tuple) and len(pr) == 2 for pr in probes)


def test_compact_telemetry_drops_unbounded_fields(bench):
    tel = {
        'upload_s': 1.23, 'rpcs': 6, 'ok': True, 'wire': 'q6',
        'raw_link_mb_s': [22.0, 450.0],
        'gate_probes_mb_s': list(range(500)),          # unbounded
        'huge_str': 'x' * 5000,                        # unbounded
        'nested': {'a': 1},                            # non-scalar
    }
    out = bench.compact_telemetry(tel)
    assert out['upload_s'] == 1.23 and out['rpcs'] == 6
    assert out['ok'] is True and out['wire'] == 'q6'
    assert out['raw_link_mb_s'] == [22.0, 450.0]
    assert 'gate_probes_mb_s' not in out
    assert 'huge_str' not in out and 'nested' not in out
    assert bench.compact_telemetry(None) == {}


def test_emit_headline_round_trips_and_stays_small(bench, capsys):
    import json
    result = {'metric': 'm', 'value': 1234.5, 'unit': 'clips/s',
              'vs_baseline': 58.8,
              'wires': {'q6': 1234.5, 'adpcm4': 1100.0},
              'telemetry': {'upload_s': 3.2, 'rpcs': 6}}
    bench.emit_headline(dict(result))
    line = capsys.readouterr().out.strip()
    assert len(line) <= bench.HEADLINE_MAX_BYTES
    parsed = json.loads(line)
    assert parsed['value'] == 1234.5 and parsed['unit'] == 'clips/s'
    assert 'telemetry' in parsed and 'wires' in parsed


def test_emit_headline_sheds_bulk_to_stay_parseable(bench, capsys):
    import json
    # a pathologically bloated telemetry must be shed, never emitted
    result = {'metric': 'm', 'value': 1234.5, 'unit': 'clips/s',
              'vs_baseline': 58.8,
              'wires': {'q6': 1234.5},
              'telemetry': {'bloat': 'x' * 10000}}
    bench.emit_headline(dict(result))
    line = capsys.readouterr().out.strip()
    assert len(line) <= bench.HEADLINE_MAX_BYTES
    parsed = json.loads(line)
    assert parsed['value'] == 1234.5
    assert 'telemetry' not in parsed       # shed, value intact


def _stub_adaptive(bench, monkeypatch, probe_bws, wiresets,
                   max_repeats=6, reality_s=1e9):
    """Adaptive-wire stub: the fake pass's duration follows the DRAWN
    wire's byte count at the current probe reading, so narrower wires
    genuinely finish faster at slow phases."""
    state = {'bw': probe_bws[0], 'probes': 0, 'passes': [],
             'wires': [], 't': 1000.0}
    sizes = {w: ws[2] for w, ws in wiresets.items()}

    def fake_now():
        state['t'] += 1e-4
        return state['t']

    def fake_sleep(s):
        state['t'] += s

    def fake_probe(mb=8):
        i = min(state['probes'], len(probe_bws) - 1)
        state['bw'] = probe_bws[i]
        state['probes'] += 1
        return state['bw']

    def fake_pass(engine, paths, read, names, tel=None, **kw):
        wire = paths                      # wireset stores the name here
        state['passes'].append(state['bw'])
        state['wires'].append(wire)
        state['t'] += sizes[wire] / (state['bw'] * 2**20) + 1.0
        return {'clip': []}, []

    monkeypatch.setattr(bench, '_now', fake_now)
    monkeypatch.setattr(bench, '_sleep', fake_sleep)
    monkeypatch.setattr(bench, 'measure_raw_link_mb_s', fake_probe)
    monkeypatch.setattr(bench, 'run_pass', fake_pass)
    monkeypatch.setattr(bench, 'MAX_REPEATS', max_repeats)
    monkeypatch.setattr(bench, 'REALITY_CHECK_S', reality_s)
    return state


def test_adaptive_gate_picks_narrow_wire_at_slow_phase(bench,
                                                       monkeypatch):
    # 20 MB/s flat slow phase: q6 (250 MiB) predicts ~13.7 s, adpcm4
    # (167 MiB) ~9.6 s — past the 8% quality margin, so after the two
    # unconditional primary draws the gate draws with adpcm4
    ws = _ws(bench, adpcm4=167)
    state = _stub_adaptive(bench, monkeypatch, [20.0], ws,
                           max_repeats=4, reality_s=0.0)
    prepared = []

    def prepare():
        # pending contract: the write + warm runs the first time the
        # prediction says this wire would win a headline draw
        prepared.append(True)
        return ws['adpcm4']

    times, tels, wires_d, events, probes = bench.gated_headline_draws(
        None, {'q6': ws['q6']}, None, lambda m: None,
        pending={'adpcm4': (ws['adpcm4'][2], prepare)})
    assert wires_d[:2] == ['q6', 'q6']          # unconditional primary
    assert prepared == [True]                   # lazily, exactly once
    assert set(wires_d[2:]) == {'adpcm4'}       # slow phase -> narrow
    assert min(times[2:]) < min(times[:2])      # and it IS faster
    assert all(t.get('wire') in ('q6', 'adpcm4') for t in tels)


def test_pending_wire_armed_only_when_it_would_win(bench, monkeypatch):
    """A pending (unprepared) wire joins the prediction by byte count
    but its expensive write + warm must NOT run at fast phases (the
    primary wins there) nor at slow phases that cannot beat the best
    draw (arming cannot improve the headline); forced reality-check
    draws at such phases fall back to the best PREPARED wire instead
    of crashing on the unprepared one."""
    ws = _ws(bench, adpcm4=167)
    # unconditional draws ride a 1000 MB/s burst (best = 1.25 s); the
    # first gated probe escalates and stays fast; later probes read 20
    # (slow — adpcm4 predicts better than q6 but can't beat 1.25 s)
    state = _stub_adaptive(bench, monkeypatch,
                           [1000.0, 1000.0, 1000.0, 20.0], ws,
                           max_repeats=4, reality_s=0.0)
    monkeypatch.setattr(bench, 'TARGET_CLIPS_S', 1e12)
    prepared = []

    def prepare():
        prepared.append(True)
        return ws['adpcm4']

    times, tels, wires_d, events, probes = bench.gated_headline_draws(
        None, {'q6': ws['q6']}, None, lambda m: None,
        pending={'adpcm4': (ws['adpcm4'][2], prepare)})
    # never armed: the fast phase didn't need it, the slow phase
    # couldn't beat the burst-time best with it
    assert prepared == []
    # every draw (incl. forced reality checks at the slow tail) used
    # the prepared primary
    assert set(wires_d) == {'q6'}
    assert len(times) == 4


def test_adaptive_gate_keeps_primary_at_fast_phase(bench, monkeypatch):
    # 1000 MB/s ramping phase: bytes are ~0.2 s of the pass either way,
    # so the narrow wire cannot clear the 8% margin — quality wins and
    # the primary keeps the draws
    ws = _ws(bench, adpcm4=167)
    state = _stub_adaptive(bench, monkeypatch, [1000.0], ws,
                           max_repeats=4, reality_s=0.0)
    times, tels, wires_d, events, probes = bench.gated_headline_draws(
        None, dict(ws), None, lambda m: None)
    assert set(wires_d) == {'q6'}


def test_adaptive_fixed_overhead_learned_per_wire(bench, monkeypatch):
    # draws happen on both wires; fixed-overhead residuals must be
    # attributed to the wire that was drawn (a heavy-decode wire's
    # residual must not pollute the primary's prediction) — observable
    # via the gate continuing to pick the narrow wire at slow phases
    # even after several draws of each
    ws = _ws(bench, adpcm4=167)
    state = _stub_adaptive(bench, monkeypatch, [20.0], ws,
                           max_repeats=6, reality_s=0.0)
    times, tels, wires_d, events, probes = bench.gated_headline_draws(
        None, dict(ws), None, lambda m: None)
    assert wires_d[2:] == ['adpcm4'] * 4


def test_gate_aborts_collapsed_draw_and_keeps_hunting(bench,
                                                      monkeypatch):
    """A gate-approved (predicted-fast) draw whose link collapses must
    be abandoned via the upload deadline: its time is NOT recorded, its
    wall cost counts toward the budgets, and the hunt continues."""
    from sed_tpu.serve.engine import LinkCollapseError
    ws = _ws(bench)
    state = {'bw': 20.0, 'probes': 0, 't': 1000.0,
             'aborts': 0, 'deadlines': []}

    def fake_now():
        state['t'] += 1e-4
        return state['t']

    def fake_probe(mb=8):
        state['probes'] += 1
        state['bw'] = 500.0 if state['probes'] >= 1 else 20.0
        return state['bw']

    def fake_pass(engine, paths, read, names, tel=None,
                  upload_deadline_s=None):
        state['deadlines'].append(upload_deadline_s)
        if upload_deadline_s is not None:
            # simulate: link collapsed, deadline missed
            state['t'] += upload_deadline_s
            state['aborts'] += 1
            raise LinkCollapseError('stub collapse')
        state['t'] += 250.0 / state['bw'] + 1.0
        return {'clip': []}, []

    monkeypatch.setattr(bench, '_now', fake_now)
    monkeypatch.setattr(bench, '_sleep', lambda s: None)
    monkeypatch.setattr(bench, 'measure_raw_link_mb_s', fake_probe)
    monkeypatch.setattr(bench, 'run_pass', fake_pass)
    monkeypatch.setattr(bench, 'MAX_REPEATS', 8)
    monkeypatch.setattr(bench, 'REALITY_CHECK_S', 1e9)
    monkeypatch.setattr(bench, 'WALL_BUDGET', 80.0)
    msgs = []
    times, tels, wires_d, events, probes = bench.gated_headline_draws(
        None, ws, None, msgs.append)
    # the two unconditional draws ran without a deadline and recorded
    assert state['deadlines'][:2] == [None, None]
    assert len(times) == 2
    # every gate-approved fast draw was deadlined, collapsed, aborted —
    # and none of them entered the recorded times
    assert state['aborts'] >= 1
    assert any('ABORTED' in m for m in msgs)


def test_reality_check_draw_runs_without_deadline(bench, monkeypatch):
    """Reality-check (forced) draws are the gate's ground truth for the
    current phase — they must run with NO abort deadline even when a
    probe reading exists."""
    ws = _ws(bench)
    state = {'t': 1000.0, 'deadlines': []}

    def fake_now():
        state['t'] += 1e-4
        return state['t']

    def fake_pass(engine, paths, read, names, tel=None,
                  upload_deadline_s=None):
        state['deadlines'].append(upload_deadline_s)
        state['t'] += 250.0 / 20.0 + 1.0
        return {'clip': []}, []

    monkeypatch.setattr(bench, '_now', fake_now)
    monkeypatch.setattr(bench, '_sleep', lambda s: None)
    monkeypatch.setattr(bench, 'measure_raw_link_mb_s', lambda mb=8: 20.0)
    monkeypatch.setattr(bench, 'run_pass', fake_pass)
    monkeypatch.setattr(bench, 'MAX_REPEATS', 4)
    monkeypatch.setattr(bench, 'REALITY_CHECK_S', 0.0)   # force always
    times, _, _, _, _ = bench.gated_headline_draws(
        None, ws, None, lambda m: None)
    assert len(times) == 4
    assert state['deadlines'] == [None] * 4


def test_futility_cut_caps_gate_deadline_at_best_time(bench, monkeypatch):
    """A gated draw's abort deadline must be capped just above the best
    recorded time: once a draw outlives min(times) it cannot improve
    the best-of-draws headline, so dragging it to 3x the prediction
    only burns draw budget (the corpus-scaling A/B showed hunt yield =
    tail samples per budget; BENCHMARKS.md 20 Aug)."""
    ws = _ws(bench)
    state = {'t': 1000.0, 'deadlines': [], 'bw': 20.0}

    def fake_now():
        state['t'] += 1e-4
        return state['t']

    def fake_probe(mb=8):
        state['bw'] = 50.0
        return state['bw']

    def fake_pass(engine, paths, read, names, tel=None,
                  upload_deadline_s=None):
        state['deadlines'].append(upload_deadline_s)
        state['t'] += 250.0 / state['bw'] + 1.0
        return {'clip': []}, []

    monkeypatch.setattr(bench, '_now', fake_now)
    monkeypatch.setattr(bench, '_sleep', lambda s: None)
    monkeypatch.setattr(bench, 'measure_raw_link_mb_s', fake_probe)
    monkeypatch.setattr(bench, 'run_pass', fake_pass)
    monkeypatch.setattr(bench, 'MAX_REPEATS', 3)
    monkeypatch.setattr(bench, 'REALITY_CHECK_S', 1e9)
    times, _, _, _, _ = bench.gated_headline_draws(
        None, ws, None, lambda m: None)
    # draws 0-1 unconditional at 20 MB/s (~13.5 s each, undeadlined);
    # the gated draw was approved at 50 MB/s (est ~6.2 s) — its
    # deadline is capped just above the 13.5 s best, well under the
    # 3x-est dead-phase bail (~18.6 s)
    assert state['deadlines'][:2] == [None, None]
    d = state['deadlines'][2]
    best = min(times[:2])
    assert d is not None
    assert d <= best * 1.05 + 1.0 + 1e-6
    assert d < bench.ABORT_FACTOR * 6.3
    # the (fast) draw itself completed and recorded
    assert len(times) == 3 and times[2] < best
