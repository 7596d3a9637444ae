"""Dataset collections: the four benchmark subsets plus the method-specific
processing entry points (reference: src/data/dataset_collection.py:10-110 and
the per-family collection classes)."""

from __future__ import annotations

from copy import deepcopy

import jax
import numpy as np

from insite_tpu.core.constants import MAX_VALUE
from insite_tpu.data.dataset import SeqDataset
from insite_tpu.data.processing import process_data_pkpd, process_data_tumor
from insite_tpu.sim import pkpd


class DatasetCollection:
    """train_f / val_f / test_cf_one_step / test_cf_treatment_seq
    (dataset_collection.py:10-31)."""

    def __init__(self):
        self.processed_data_encoder = False
        self.processed_data_decoder = False
        self.processed_data_multi = False
        self.processed_data_msm = False
        self.train_f = None
        self.val_f = None
        self.test_cf_one_step = None
        self.test_cf_treatment_seq = None
        self.train_scaling_params = None
        self.projection_horizon = None
        self.autoregressive = True
        self.has_vitals = False
        self.treatment_mode = 'multiclass'

    # family-specific hook --------------------------------------------------
    def _process(self, ds: SeqDataset, include_continuous_treatment=False):
        raise NotImplementedError

    # ----------------------------------------------------------------------
    def process_data_encoder(self):
        for ds in (self.train_f, self.val_f, self.test_cf_one_step):
            self._process(ds)
        self.processed_data_encoder = True

    def process_data_multi(self, include_continuous_treatment=False):
        """Used by CT and the SINDy family (dataset_collection.py:74-86)."""
        for ds in (self.train_f, self.val_f, self.test_cf_one_step,
                   self.test_cf_treatment_seq):
            if ds is not None:
                self._process(ds, include_continuous_treatment)
        self.test_cf_treatment_seq.process_sequential_test(
            self.projection_horizon)
        self.test_cf_treatment_seq.process_sequential_multi(
            self.projection_horizon)
        self.processed_data_multi = True

    def process_data_decoder(self, encoder, save_encoder_r=False):
        """Used by CRN, RMSN, EDCT (dataset_collection.py:50-72)."""
        for ds in (self.train_f, self.val_f, self.test_cf_treatment_seq):
            self._process(ds)
        r_train = encoder.get_representations(self.train_f)
        r_val = encoder.get_representations(self.val_f)
        r_test = encoder.get_representations(self.test_cf_treatment_seq)
        out_test = encoder.get_predictions(self.test_cf_treatment_seq)
        self.train_f.process_sequential(r_train, self.projection_horizon,
                                        save_encoder_r)
        self.val_f.process_sequential(r_val, self.projection_horizon,
                                      save_encoder_r)
        self.test_cf_treatment_seq.process_sequential_test(
            self.projection_horizon, r_test, save_encoder_r)
        self.test_cf_treatment_seq.process_autoregressive_test(
            r_test, out_test, self.projection_horizon, save_encoder_r)
        self.processed_data_decoder = True

    def process_propensity_train_f(self, propensity_treatment,
                                   propensity_history):
        """Stabilised weights for RMSN (dataset_collection.py:39-48)."""
        pt = propensity_treatment.get_propensity_scores(self.train_f)
        ph = propensity_history.get_propensity_scores(self.train_f)
        self.train_f.data['stabilized_weights'] = np.prod(pt / ph, axis=2)

    def split_train_f_holdout(self, holdout_ratio=0.1):
        """G-Net holdout (dataset_collection.py:88-97)."""
        if hasattr(self, 'train_f_holdout') or holdout_ratio <= 0.0:
            return
        n = len(self.train_f)
        rng = np.random.RandomState(self.seed)
        perm = rng.permutation(n)
        # sklearn train_test_split takes ceil(n * ratio) holdout rows;
        # membership differs (different shuffler) — distribution-level parity
        n_holdout = int(np.ceil(n * holdout_ratio))
        hold_idx, train_idx = perm[:n_holdout], perm[n_holdout:]
        self.train_f_holdout = deepcopy(self.train_f)
        for k, v in list(self.train_f.data.items()):
            if hasattr(v, 'shape') and v.shape[:1] == (n,):
                self.train_f.data[k] = v[train_idx]
                self.train_f_holdout.data[k] = v[hold_idx]

    def explode_cf_treatment_seq(self, mc_samples=1):
        """MC views for G-Net (dataset_collection.py:99-110).  The
        reference deepcopies because it mutates each copy in place; our
        G-Net copies the arrays it mutates itself, so the MC list holds
        references (25 deepcopies of a 10k-patient test set are GBs of
        pure waste)."""
        if not hasattr(self, 'test_cf_treatment_seq_mc'):
            self.test_cf_treatment_seq_mc = \
                [self.test_cf_treatment_seq] * mc_samples


class RealDatasetCollection(DatasetCollection):
    """Factual-only collection (train_f / val_f / test_f) for observational
    data without counterfactual ground truth — e.g. MIMIC-style EHR cohorts
    (reference: dataset_collection.py:113-205).  Takes already-processed
    SeqDatasets; test evaluation uses exploded factual trajectories.
    """

    def __init__(self, train_f: SeqDataset, val_f: SeqDataset,
                 test_f: SeqDataset, projection_horizon: int = 5,
                 treatment_mode: str = 'multiclass', seed: int = 0):
        super().__init__()
        self.train_f, self.val_f, self.test_f = train_f, val_f, test_f
        self.has_vitals = 'vitals' in train_f.data
        # the evaluation entry points expect these aliases: both test views
        # are the factual test set for real data
        self.test_cf_one_step = test_f
        self.test_cf_treatment_seq = None
        self.projection_horizon = projection_horizon
        self.treatment_mode = treatment_mode
        self.seed = seed

    def _process(self, ds, include_continuous_treatment=False):
        assert ds.processed, ('RealDatasetCollection expects pre-processed '
                              'SeqDatasets (unified keys already built)')

    def process_data_multi(self, include_continuous_treatment=False):
        """Used by CT (dataset_collection.py:169-181): n-step evaluation on
        exploded factual test trajectories."""
        self.test_f_multi = deepcopy(self.test_f)
        self.test_f_multi.explode_trajectories(self.projection_horizon)
        self.test_f_multi.process_sequential_test(self.projection_horizon)
        self.test_f_multi.process_sequential_multi(self.projection_horizon)
        self.test_cf_treatment_seq = self.test_f_multi
        self.processed_data_multi = True

    def process_data_decoder(self, encoder, save_encoder_r=False):
        """Used by CRN, RMSN, EDCT (dataset_collection.py:148-168).

        The decoder stages consume a COPY of test_f: the raw factual rows
        stay available as test_cf_one_step for the encoder's factual-RMSE
        protocol, which the reference computes on unprocessed test_f
        (train_enc_dec.py:92-100) before decoder processing."""
        test_seq = deepcopy(self.test_f)
        test_seq.explode_trajectories(self.projection_horizon)
        r_train = encoder.get_representations(self.train_f)
        r_val = encoder.get_representations(self.val_f)
        r_test = encoder.get_representations(test_seq)
        out_test = encoder.get_predictions(test_seq)
        self.train_f.process_sequential(r_train, self.projection_horizon,
                                        save_encoder_r)
        self.val_f.process_sequential(r_val, self.projection_horizon,
                                      save_encoder_r)
        test_seq.process_sequential_test(self.projection_horizon, r_test,
                                         save_encoder_r)
        test_seq.process_autoregressive_test(
            r_test, out_test, self.projection_horizon, save_encoder_r)
        self.test_cf_treatment_seq = test_seq
        self.processed_data_decoder = True


class PkpdDatasetCollection(DatasetCollection):
    """EQ_4 family collection (pkpd/dataset.py:557-607)."""

    def __init__(self, conf_coeff, num_patients: dict, equation_str: str,
                 seed: int, window_size=15, max_seq_length=60,
                 projection_horizon=5, lag=0,
                 cf_seq_mode='sliding_treatment',
                 treatment_mode='multiclass', dtype=None, noise_scale=1.0,
                 **kwargs):
        super().__init__()
        from insite_tpu.core.dtypes import default_float
        dtype = dtype or default_float()
        self.seed = seed
        self.equation = pkpd.Equation[equation_str]
        self.equation_name = equation_str
        self.projection_horizon = projection_horizon
        self.treatment_mode = treatment_mode
        self.norm_const = MAX_VALUE

        def subset(n, mode, name):
            # Each subset re-derives params from the same seed, mirroring
            # SyntheticPkpdDataset.__init__ (pkpd/dataset.py:52-72).
            key = jax.random.PRNGKey(seed)
            key, sub = jax.random.split(key)
            params = pkpd.generate_params(
                n, conf_coeff=conf_coeff, window_size=window_size, lag=lag,
                key=sub, equation=self.equation, dtype=dtype)
            if 'observation_noise' in params:
                # INSIGHT_NOISE sweep: scale the observation-noise std of
                # the B/C/D variants
                params['observation_noise'] = \
                    params['observation_noise'] * noise_scale
            key, sub = jax.random.split(key)
            if mode == 'factual':
                data = pkpd.simulate_factual(params, max_seq_length, sub,
                                             self.equation, dtype=dtype)
            elif mode == 'counterfactual_one_step':
                data = pkpd.simulate_counterfactual_1_step(
                    params, max_seq_length, sub, self.equation, dtype=dtype)
            else:
                data = pkpd.simulate_counterfactuals_treatment_seq(
                    params, max_seq_length, projection_horizon, sub,
                    self.equation, cf_seq_mode=cf_seq_mode, dtype=dtype)
            ds = SeqDataset(data, name, norm_const=MAX_VALUE)
            # ground truth for oracle checks / INSIGHT_RECOVER_PARAMETRIC_
            # DIST (harness/insights.py); one batched host transfer
            ds.sim_params = jax.device_get(params)
            return ds

        self.train_f = subset(num_patients['train'], 'factual', 'train')
        self.val_f = subset(num_patients['val'], 'factual', 'val')
        self.test_cf_one_step = subset(num_patients['test'],
                                       'counterfactual_one_step', 'test')
        self.test_cf_treatment_seq = subset(
            num_patients['test'], 'counterfactual_treatment_seq', 'test')
        self.train_scaling_params = pkpd.get_scaling_params(
            self.train_f.data)

    def _process(self, ds: SeqDataset, include_continuous_treatment=False):
        process_data_pkpd(ds, self.train_scaling_params, self.treatment_mode,
                          self.equation_name, include_continuous_treatment)


class CancerDatasetCollection(DatasetCollection):
    """cancer_sim collection (cancer_sim/dataset.py:555-605)."""

    def __init__(self, chemo_coeff, radio_coeff, num_patients: dict,
                 seed: int, window_size=15, max_seq_length=60,
                 projection_horizon=5, lag=0,
                 cf_seq_mode='sliding_treatment',
                 treatment_mode='multiclass', **kwargs):
        super().__init__()
        from insite_tpu.sim import cancer
        self.seed = seed
        self.equation_name = 'CANCER_SIM'
        self.projection_horizon = projection_horizon
        self.treatment_mode = treatment_mode
        self.norm_const = cancer.TUMOUR_DEATH_THRESHOLD

        np.random.seed(seed)
        key = jax.random.PRNGKey(seed)

        def subset(n, mode, name):
            nonlocal key
            key, sub = jax.random.split(key)
            params = cancer.generate_params(
                n, chemo_coeff=chemo_coeff, radio_coeff=radio_coeff,
                window_size=window_size, lag=lag, key=sub)
            key, sub = jax.random.split(key)
            if mode == 'factual':
                data = cancer.simulate_factual(params, max_seq_length, sub)
            elif mode == 'counterfactual_one_step':
                data = cancer.simulate_counterfactual_1_step(
                    params, max_seq_length, sub)
            else:
                data = cancer.simulate_counterfactuals_treatment_seq(
                    params, max_seq_length, projection_horizon, sub,
                    cf_seq_mode=cf_seq_mode)
            ds = SeqDataset(data, name,
                            norm_const=cancer.TUMOUR_DEATH_THRESHOLD)
            ds.sim_params = jax.device_get(params)
            return ds

        self.train_f = subset(num_patients['train'], 'factual', 'train')
        self.val_f = subset(num_patients['val'], 'factual', 'val')
        self.test_cf_one_step = subset(num_patients['test'],
                                       'counterfactual_one_step', 'test')
        self.test_cf_treatment_seq = subset(
            num_patients['test'], 'counterfactual_treatment_seq', 'test')
        self.train_scaling_params = cancer.get_scaling_params(
            self.train_f.data)

    def _process(self, ds: SeqDataset, include_continuous_treatment=False):
        process_data_tumor(ds, self.train_scaling_params, self.treatment_mode,
                           self.equation_name, include_continuous_treatment)


class ContinuousDatasetCollection(CancerDatasetCollection):
    """EQ_5 A-D collection (continuous/dataset.py:560-618): the cancer model
    with per-variant heterogeneity + observation noise."""

    def __init__(self, chemo_coeff, radio_coeff, num_patients: dict,
                 equation_str: str, seed: int, **kwargs):
        from insite_tpu.sim import continuous, cancer
        DatasetCollection.__init__(self)
        self.seed = seed
        self.equation_name = equation_str
        self.projection_horizon = kwargs.get('projection_horizon', 5)
        self.treatment_mode = kwargs.get('treatment_mode', 'multiclass')
        self.norm_const = cancer.TUMOUR_DEATH_THRESHOLD
        window_size = kwargs.get('window_size', 15)
        max_seq_length = kwargs.get('max_seq_length', 60)
        cf_seq_mode = kwargs.get('cf_seq_mode', 'sliding_treatment')
        lag = kwargs.get('lag', 0)
        equation = pkpd.Equation[equation_str]

        np.random.seed(seed)
        key = jax.random.PRNGKey(seed)

        def subset(n, mode, name):
            nonlocal key
            key, sub = jax.random.split(key)
            params = continuous.generate_params(
                n, chemo_coeff=chemo_coeff, radio_coeff=radio_coeff,
                window_size=window_size, lag=lag, key=sub, equation=equation)
            key, sub = jax.random.split(key)
            if mode == 'factual':
                data = continuous.simulate_factual(params, max_seq_length,
                                                   sub, equation)
            elif mode == 'counterfactual_one_step':
                data = continuous.simulate_counterfactual_1_step(
                    params, max_seq_length, sub, equation)
            else:
                data = continuous.simulate_counterfactuals_treatment_seq(
                    params, max_seq_length, self.projection_horizon, sub,
                    equation, cf_seq_mode=cf_seq_mode)
            ds = SeqDataset(data, name,
                            norm_const=cancer.TUMOUR_DEATH_THRESHOLD)
            ds.sim_params = jax.device_get(params)
            return ds

        self.train_f = subset(num_patients['train'], 'factual', 'train')
        self.val_f = subset(num_patients['val'], 'factual', 'val')
        self.test_cf_one_step = subset(num_patients['test'],
                                       'counterfactual_one_step', 'test')
        self.test_cf_treatment_seq = subset(
            num_patients['test'], 'counterfactual_treatment_seq', 'test')
        from insite_tpu.sim import continuous as cont
        self.train_scaling_params = cont.get_scaling_params(
            self.train_f.data)


def make_collection(dataset_name: str, num_patients: dict, seed: int,
                    coeff: float, **kwargs) -> DatasetCollection:
    """Factory keyed like run.py's dataset names (run.py:213-241)."""
    if 'EQ_4' in dataset_name:
        return PkpdDatasetCollection(conf_coeff=coeff,
                                     num_patients=num_patients,
                                     equation_str=dataset_name, seed=seed,
                                     **kwargs)
    if dataset_name == 'cancer_sim':
        return CancerDatasetCollection(chemo_coeff=coeff, radio_coeff=coeff,
                                       num_patients=num_patients, seed=seed,
                                       **kwargs)
    if 'EQ_5' in dataset_name:
        return ContinuousDatasetCollection(chemo_coeff=coeff,
                                           radio_coeff=coeff,
                                           num_patients=num_patients,
                                           equation_str=dataset_name,
                                           seed=seed, **kwargs)
    raise ValueError(f'unknown dataset {dataset_name}')
