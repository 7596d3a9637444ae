"""tools/seed_gaps.py: the queue's per-cell seed accounting."""

import importlib.util
import os
import sys

import numpy as np
import pandas as pd

spec = importlib.util.spec_from_file_location(
    'seed_gaps', os.path.join(os.path.dirname(__file__), '..', 'tools',
                              'seed_gaps.py'))
seed_gaps = importlib.util.module_from_spec(spec)
spec.loader.exec_module(seed_gaps)


def test_counts_skip_wsindy_off_family():
    df = pd.DataFrame({'method_name': ['wsindy'], 'dataset_name': ['EQ_4_A'],
                       'seed': [0]})
    c = seed_gaps.counts(df)
    assert c[('wsindy', 'cancer_sim')] is None     # reference skip
    assert c[('wsindy', 'EQ_4_A')] == 1


def test_plan_groups_consecutive_missing_runs(tmp_path, capsys, monkeypatch):
    df = pd.DataFrame({
        'method_name': ['crn'] * 3,
        'dataset_name': ['EQ_4_A'] * 3,
        'seed': [2, 3, 7],
    })
    monkeypatch.setattr(seed_gaps, 'protocol_df', lambda logs: df)
    monkeypatch.setattr(sys, 'argv',
                        ['seed_gaps.py', '--method', 'crn', '--plan'])
    seed_gaps.main()
    out = [l for l in capsys.readouterr().out.splitlines()
           if l.startswith('EQ_4_A')]
    # missing: 0-1, 4-6, 8-9 -> three consecutive ranges
    assert out == ['EQ_4_A 0 2', 'EQ_4_A 4 3', 'EQ_4_A 8 2']
