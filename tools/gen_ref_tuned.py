#!/usr/bin/env python
"""Generate configs/ref_tuned.yaml from the reference's tuned per-dataset
hparam overlays (VERDICT r4 #7).

Reads `/root/reference/config/backbone/<m>_hparams/{cancer_sim[_domain_conf],
pkpd_sim[_domain_conf]}/<coeff>.yaml`, maps the Hydra field paths onto our
model-config dataclass fields, drops entries equal to our defaults (which
already equal the reference's `benchmark_hparams/*` — its shipped main
table runs `+backbone/benchmark_hparams=<m>` at every coefficient,
run.py:197-263, and the per-coefficient tuned files are dead configs in
its own protocol: the `+backbone/<m>_hparams=...` lines are commented out
or gated on HYPER_PARAMETER_TUNE), and emits the remainder as
`model_overrides` keyed `<method>@<dataset>/<coeff>`.

Usage: python tools/gen_ref_tuned.py   (rewrites configs/ref_tuned.yaml)
"""

import dataclasses
import os
import sys

import yaml

sys.path[0] = '/root/repo'   # tools/queue.py shadows stdlib `queue`

REF = '/root/reference/config/backbone'
OUT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), 'configs', 'ref_tuned.yaml')

# method -> (ref subdir name per family, path->our-field map)
CT_MAP = {
    ('multi', 'optimizer', 'learning_rate'): 'learning_rate',
    ('multi', 'batch_size'): 'batch_size',
    ('multi', 'seq_hidden_units'): 'seq_hidden_units',
    ('multi', 'br_size'): 'br_size',
    ('multi', 'fc_hidden_units'): 'fc_hidden_units',
    ('multi', 'dropout_rate'): 'dropout_rate',
    ('self_positional_encoding', 'max_relative_position'):
        'max_relative_position',
}
CRN_MAP = {
    ('encoder', 'optimizer', 'learning_rate'): 'enc_learning_rate',
    ('encoder', 'batch_size'): 'enc_batch_size',
    ('encoder', 'seq_hidden_units'): 'enc_seq_hidden_units',
    ('encoder', 'br_size'): 'enc_br_size',
    ('encoder', 'fc_hidden_units'): 'enc_fc_hidden_units',
    ('encoder', 'dropout_rate'): 'enc_dropout_rate',
    ('decoder', 'optimizer', 'learning_rate'): 'dec_learning_rate',
    ('decoder', 'batch_size'): 'dec_batch_size',
    ('decoder', 'br_size'): 'dec_br_size',
    ('decoder', 'fc_hidden_units'): 'dec_fc_hidden_units',
    ('decoder', 'dropout_rate'): 'dec_dropout_rate',
}
EDCT_MAP = {
    ('encoder', 'optimizer', 'learning_rate'): 'enc_learning_rate',
    ('encoder', 'batch_size'): 'enc_batch_size',
    ('encoder', 'seq_hidden_units'): 'enc_seq_hidden_units',
    ('encoder', 'br_size'): 'enc_br_size',
    ('encoder', 'fc_hidden_units'): 'enc_fc_hidden_units',
    ('encoder', 'dropout_rate'): 'enc_dropout_rate',
    ('encoder', 'num_layer'): 'num_layer',
    ('decoder', 'optimizer', 'learning_rate'): 'dec_learning_rate',
    ('decoder', 'batch_size'): 'dec_batch_size',
    ('decoder', 'br_size'): 'dec_br_size',
    ('decoder', 'fc_hidden_units'): 'dec_fc_hidden_units',
    ('decoder', 'dropout_rate'): 'dec_dropout_rate',
}
RMSN_MAP = {}
for ref_block, ours in [('propensity_treatment', 'prop_treat'),
                        ('propensity_history', 'prop_hist'),
                        ('encoder', 'enc'), ('decoder', 'dec')]:
    RMSN_MAP.update({
        (ref_block, 'seq_hidden_units'):
            f'{ours}_hidden' if ours.startswith('prop') else f'{ours}_hidden',
        (ref_block, 'dropout_rate'): f'{ours}_dropout',
        (ref_block, 'optimizer', 'learning_rate'): f'{ours}_lr',
        (ref_block, 'batch_size'): f'{ours}_bs',
        (ref_block, 'max_grad_norm'): f'{ours}_clip',
    })
GNET_MAP = {
    ('g_net', 'optimizer', 'learning_rate'): 'learning_rate',
    ('g_net', 'batch_size'): 'batch_size',
    ('g_net', 'seq_hidden_units'): 'seq_hidden_units',
    ('g_net', 'r_size'): 'r_size',
    ('g_net', 'fc_hidden_units'): 'fc_hidden_units',
    ('g_net', 'dropout_rate'): 'dropout_rate',
    ('g_net', 'num_layer'): 'num_layer',
}
EXP_MAP = {  # exp-section keys shared by the adversarial methods
    ('alpha',): 'alpha', ('beta',): 'beta',
    ('weights_ema',): 'weights_ema', ('balancing',): 'balancing',
}

METHODS = {
    'ct': ('ct_hparams', '_domain_conf', CT_MAP, True),
    'crn': ('crn_hparams', '_domain_conf', CRN_MAP, True),
    'edct': ('edct_hparams', '_domain_conf', EDCT_MAP, True),
    'rmsn': ('rmsn_hparams', '', RMSN_MAP, False),
    'gnet': ('gnet_hparams', '', GNET_MAP, False),
}
FAMILIES = {'cancer_sim': ['cancer_sim'],
            'pkpd_sim': ['EQ_4_A', 'EQ_4_B', 'EQ_4_C', 'EQ_4_D']}


def _dig(d, path):
    for k in path:
        if not isinstance(d, dict) or k not in d:
            return None
        d = d[k]
    return d


def _defaults(method):
    if method == 'ct':
        from insite_tpu.models.ct import CTConfig as C
    elif method == 'crn':
        from insite_tpu.models.crn import CRNConfig as C
    elif method == 'edct':
        from insite_tpu.models.edct import EDCTConfig as C
    elif method == 'rmsn':
        from insite_tpu.models.rmsn import RMSNConfig as C
    else:
        from insite_tpu.models.gnet import GNetConfig as C
    return {f.name: f.default for f in dataclasses.fields(C)}


def main():
    overrides = {}
    for method, (dirname, suffix, fmap, has_exp) in METHODS.items():
        defaults = _defaults(method)
        for fam, datasets in FAMILIES.items():
            fam_dir = os.path.join(REF, dirname, fam + suffix)
            if not os.path.isdir(fam_dir):
                continue
            for fn in sorted(os.listdir(fam_dir)):
                if not fn.endswith('.yaml'):
                    continue
                coeff = fn[:-5]
                with open(os.path.join(fam_dir, fn)) as f:
                    raw = yaml.safe_load(f) or {}
                entry = {}
                for path, ours in fmap.items():
                    v = _dig(raw.get('model', {}), path)
                    if v is not None and ours in defaults \
                            and v != defaults[ours]:
                        entry[ours] = v
                if has_exp:
                    for path, ours in EXP_MAP.items():
                        v = _dig(raw.get('exp', {}), path)
                        if v is not None and ours in defaults \
                                and v != defaults[ours]:
                            entry[ours] = v
                if not entry:
                    continue
                for ds in datasets:
                    overrides[f'{method}@{ds}/{coeff}'] = dict(entry)
    header = (
        '# Reference tuned per-dataset hparams as a model_overrides\n'
        '# preset — generated by tools/gen_ref_tuned.py from the\n'
        '# reference\'s config/backbone/<m>_hparams/ YAMLs. Only values\n'
        '# differing from our defaults (== the reference\'s\n'
        '# benchmark_hparams, which its shipped protocol actually used\n'
        '# at every coefficient — run.py:197-263 applies only\n'
        '# +backbone/benchmark_hparams=<m>; the per-coefficient tuned\n'
        '# files are dead configs in its own protocol) are listed.\n'
        '# The main-table coefficient (2.0) is tuned == default for\n'
        '# every method.  Use: python run.py --config '
        'configs/ref_tuned.yaml ...\n')
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, 'w') as f:
        f.write(header)
        yaml.safe_dump({'model_overrides': overrides}, f, sort_keys=True,
                       width=78)
    print(f'wrote {OUT}: {len(overrides)} override cells')


if __name__ == '__main__':
    main()
