"""Honest-reporting invariants for the bench's wire-admission gate.

Round-4 verdict #1: the headline once ran on a wire whose event match
vs int16 was 0.40 — throughput bought with accuracy.  The fix: a wire
may front the auto-mode headline ONLY if its measured segment-based
ER/F1 delta vs the int16 decode is <= 0.5% (the BASELINE.json
contract) on >= 256 hardened-corpus clips, measured against the
trained bench checkpoint by tools/wire_admission.py and committed as
tools/wire_admission.json.  These tests pin that the gate exists, is
coherent, and is actually enforced by bench.py — so the bench cannot
silently regress into an inadmissible-wire headline again (verdict
#8).
"""

import importlib.util
import json
import os

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TABLE = os.path.join(ROOT, 'tools', 'wire_admission.json')


@pytest.fixture()
def bench():
    spec = importlib.util.spec_from_file_location(
        'bench_under_admission_test', os.path.join(ROOT, 'bench.py'))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_admission_table_exists_and_coherent():
    with open(TABLE) as f:
        t = json.load(f)
    meta = t['meta']
    # the contract: >= 256 clips, 0.5% tolerance, segment-based metric
    assert meta['clips'] >= 256
    assert meta['tolerance'] == 0.005
    assert 'segment-based' in meta['metric']
    # int16 is the parity baseline by definition
    assert t['int16']['admitted'] is True
    for w, r in t['wires'].items():
        # every admitted flag must agree with its own recorded deltas
        expect = r['d_er'] <= meta['tolerance'] + 1e-9 \
            and r['d_f1'] <= meta['tolerance'] + 1e-9
        assert r['admitted'] == expect, (w, r)
        assert r['bytes_per_clip'] > 0
    # the exact-parity rungs must pass their own gate: q6 decodes are
    # event-identical on the bench distribution, v6 is bit-identical
    # to q6 by construction
    assert t['wires']['q6']['admitted'] is True
    if 'v6' in t['wires']:
        assert t['wires']['v6']['admitted'] is True
        assert t['wires']['v6']['er'] == t['wires']['q6']['er']
        assert t['wires']['v6']['f1'] == t['wires']['q6']['f1']


def test_bench_loads_table_and_filters_auto_wires(bench):
    admitted, table = bench.load_wire_admission()
    assert 'int16' in admitted and 'q6' in admitted
    # explicit lists are FILTERED by the table
    kept = bench.resolve_auto_wires(','.join(sorted(admitted)), admitted)
    assert set(kept) <= admitted
    # a non-admitted wire cannot ride auto mode
    fake = {'int16', 'q6'}
    assert bench.resolve_auto_wires('q6,q2', fake) == ['q6']
    # 'admitted' expands to q6-primary + admitted alternates by bytes
    exp = bench.resolve_auto_wires('admitted', admitted)
    assert exp[0] == 'q6'
    assert set(exp) <= admitted and 'int16' not in exp[1:]
    # nothing admitted left -> loud failure, not a silent fallback
    with pytest.raises(SystemExit):
        bench.resolve_auto_wires('q2,q3', fake)


def test_default_auto_wires_are_admitted(bench):
    """The bench's ACTUAL default configuration (BENCH_WIRE=auto,
    BENCH_AUTO_WIRES=admitted) may only ever draw admitted wires."""
    admitted, _ = bench.load_wire_admission()
    assert set(bench.AUTO_WIRES) <= admitted
    assert bench.PRIMARY_WIRE in admitted


def test_vs_baseline_constant_and_headline_fields(bench):
    # the official comparison point: 21 clips/s (the reference's 747
    # test clips in ~34-36 s, BASELINE.md / thesis Results chapter)
    assert bench.BASELINE_CLIPS_PER_SEC == 21.0
    # the size-capped headline emitter never drops the honesty fields
    big = {'metric': 'm', 'value': 1.0, 'unit': 'u', 'vs_baseline': 2.0,
           'wire_admitted': True,
           'wires': {f'w{i}': i for i in range(40)},
           'telemetry': {f't{i}': i for i in range(200)}}
    line = bench.emit_headline(dict(big))
    out = json.loads(line)
    assert len(line) <= bench.HEADLINE_MAX_BYTES
    for k in ('metric', 'value', 'unit', 'vs_baseline', 'wire_admitted'):
        assert k in out
