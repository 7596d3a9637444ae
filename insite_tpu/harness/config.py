"""Experiment configuration: the two-level config of the reference
(outer sweep config config/config.yaml + per-run overlays assembled in
run.py:197-263) as plain dataclasses with YAML override support."""

from __future__ import annotations

from dataclasses import dataclass, field


# per-dataset SINDy hyperparameters (config/config.yaml:17-28)
SINDY_THRESHOLD = {'cancer_sim': 0.001, 'EQ_5': 0.001, 'EQ_4': 0.1}
SINDY_LAM = {'cancer_sim': 10.0, 'EQ_5': 10.0, 'EQ_4': 10.0}
SINDY_ALPHA = 0.5


def sindy_params_for(dataset_name: str):
    thr = [v for k, v in SINDY_THRESHOLD.items() if k in dataset_name]
    lam = [v for k, v in SINDY_LAM.items() if k in dataset_name]
    assert len(thr) == 1 and len(lam) == 1
    return thr[0], lam[0]


@dataclass
class RunConfig:
    """Outer sweep config (config/config.yaml:1-59)."""

    epochs: int = 100
    train_samples: int = 1000
    val_samples: int = 100
    test_samples: int = 100
    domain_conf: float = 2.0
    seed_start: int = 0
    seed_runs: int = 10
    # the reference's ct_methods_to_evaluate plus edct, which it ships as
    # a runnable backbone (config/backbone/edct.yaml) but leaves out of
    # its default list — our main table carries a measured edct column
    methods: tuple = ('insite', 'sindy', 'wsindy', 'crn', 'msm', 'gnet',
                      'ct', 'rmsn', 'edct')
    datasets: tuple = ('cancer_sim', 'EQ_5_A', 'EQ_5_B', 'EQ_5_C', 'EQ_5_D',
                       'EQ_4_A', 'EQ_4_B', 'EQ_4_C', 'EQ_4_D')
    domain_confs: tuple = (0, 1, 2, 3, 4)
    # INSIGHT_NOISE: observation-noise std multipliers swept on EQ_4_B
    noise_scales: tuple = (0.0, 0.5, 1.0, 2.0, 5.0)
    # INSIGHT_LESS_SAMPLES: train-cohort sizes swept on EQ_4_D
    train_sample_grid: tuple = (50, 100, 250, 500, 1000)
    noise_scale: float = 1.0
    experiment: str = 'MAIN_TABLE'
    gnet_mc_samples: int = 25
    cf_seq_mode: str = 'sliding_treatment'
    load_from_cache: bool = False
    force_recache: bool = False
    tune_hparams: bool = False   # insite: vmapped lam-grid search on val;
    # neural: seeded grid_search over tuning.NEURAL_HPARAM_GRIDS
    tune_trials: int = 10        # neural trials subsampled from the grid
    # (the reference's OptunaSearch num_samples analog)
    # 'grid' = flat seeded subsampled grid; 'sha' = adaptive successive
    # halving (small epoch budgets first, survivors promoted — the
    # OptunaSearch-with-pruning analog)
    tune_algo: str = 'grid'
    # tuned model-hparam overlays (the reference's
    # `+backbone/<m>_hparams/<ds>_domain_conf/<coeff>.yaml` mechanics,
    # run.py:197-263 / config/backbone/): maps an overlay key to a dict of
    # model-config fields. Keys, least to most specific (later wins):
    #   '<method>'                    e.g. 'ct'
    #   '<method>@<dataset>'          e.g. 'ct@EQ_4_D'
    #   '<method>@<dataset>/<coeff>'  e.g. 'ct@EQ_4_D/2'
    model_overrides: dict = field(default_factory=dict)
    flush_mode: bool = False
    debug_mode: bool = True
    log_dir: str = 'logs'
    # JSONL metrics sink (mirrored to MLflow when available; '' disables)
    metrics_jsonl: str = 'logs/metrics.jsonl'
    # resume a sweep from a previous log: completed (dataset, method, seed,
    # gamma[, override]) runs are skipped and their logged rows reused
    # (the reference can only re-run a whole sweep — SURVEY.md §5)
    resume_log: str = ''
    # run each experiment in a fresh interpreter (the reference's
    # multiprocessing-pool blast radius, run.py:91-131): a device-level
    # failure such as an HBM OOM then cannot wedge the rest of the sweep
    isolate_runs: bool = False

    def flush(self):
        """CI fast path (run.py:71-81)."""
        self.epochs = 1
        self.seed_start, self.seed_runs = 0, 1
        self.gnet_mc_samples = 2
        self.train_samples, self.val_samples, self.test_samples = 1000, 10, 10
        return self

    @classmethod
    def from_yaml(cls, path: str, **overrides) -> 'RunConfig':
        """Load a sweep config from YAML (the Hydra config.yaml analog);
        keyword overrides win over file values. Lists become tuples so
        fields stay hashable."""
        import yaml
        with open(path) as f:
            raw = yaml.safe_load(f) or {}
        if not isinstance(raw, dict):
            raise ValueError(f'{path} must contain a YAML mapping of '
                             f'RunConfig fields, got {type(raw).__name__}')
        import dataclasses
        valid = {f.name for f in dataclasses.fields(cls)}
        unknown = set(raw) - valid
        if unknown:
            raise ValueError(f'unknown RunConfig fields in {path}: '
                             f'{sorted(unknown)}')
        bad_kw = set(overrides) - valid
        if bad_kw:
            raise ValueError(f'unknown RunConfig override kwargs: '
                             f'{sorted(bad_kw)}')
        raw.update(overrides)
        return cls.from_dict(raw)

    @classmethod
    def from_dict(cls, raw: dict) -> 'RunConfig':
        """Rebuild from a plain (e.g. JSON round-tripped) mapping; lists
        become tuples so fields stay hashable."""
        return cls(**{k: tuple(v) if isinstance(v, list) else v
                      for k, v in raw.items()})
