"""Extra training coverage: conformer train step, weak-only CLI driver."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from sed_tpu import losses
from sed_tpu.config import AUDIO_16K, CLASSES_NUM, LABELS
from sed_tpu.models.registry import get_model
from sed_tpu.train.state import create_train_state
from sed_tpu.train.step import make_train_step


def test_conformer_train_step():
    """Conformer blocks carry BatchNorm + dropout; one joint step must
    run and update finite params."""
    rng = np.random.RandomState(0)
    sr = AUDIO_16K.sample_rate
    model = get_model('Cnn_9layers_Conformer_FrameAtt', AUDIO_16K)
    weak = {
        'waveform': rng.uniform(-0.1, 0.1, (2, sr)).astype(np.float32),
        'target': (rng.rand(2, CLASSES_NUM) > 0.8).astype(np.float32),
    }
    strong = {
        'waveform': rng.uniform(-0.1, 0.1, (2, sr)).astype(np.float32),
        'strong_target': (rng.rand(2, 100, CLASSES_NUM) > 0.9)
        .astype(np.float32),
    }
    state = create_train_state(model, jax.random.PRNGKey(0),
                               jnp.asarray(weak['waveform']))
    step = make_train_step(model, losses.clip_bce, losses.frame_bce,
                           mixup=False, timeshift=False, spec_augment=True,
                           donate=False)
    state, metrics = step(state, weak, strong, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics['loss']))
    assert all(np.isfinite(np.asarray(p)).all()
               for p in jax.tree.leaves(state.params))


def test_weak_only_cli_driver(tmp_path):
    from sed_tpu.cli import features as features_cli
    from sed_tpu.cli import main as main_cli
    from sed_tpu.data import audio_io

    cfg = AUDIO_16K
    rng = np.random.RandomState(1)
    dataset = tmp_path / 'dataset'
    ws = tmp_path / 'ws'
    meta = dataset / 'metadata'
    meta.mkdir(parents=True)
    for split in ('training', 'testing'):
        d = dataset / split
        d.mkdir()
        rows = []
        for i in range(4):
            name = f'{split}{i}_0.wav'
            audio_io.save_wav(str(d / name),
                              rng.uniform(-0.3, 0.3, cfg.sample_rate * 10),
                              cfg.sample_rate)
            rows.append(f'{split}{i},0.000,10.000,{LABELS[i % 3]},/m/x\n')
        (meta / f'{split}_set.csv').write_text(''.join(rows))
    (meta / 'groundtruth_strong_label_testing_set.csv').write_text(
        ''.join(f'testing{i}_0.wav,1.0,4.0,{LABELS[i % 3]}\n'
                for i in range(4)))

    for split in ('training', 'testing'):
        features_cli.main(['pack_audio_files_to_hdf5',
                           '--dataset_dir', str(dataset),
                           '--workspace', str(ws),
                           '--data_type', split, '--audio_16k'])

    main_cli.main(['train', '--dataset_dir', str(dataset),
                   '--workspace', str(ws),
                   '--model_type', 'Cnn_9layers_FrameAvg',
                   '--loss_type', 'clip_bce', '--augmentation', 'mixup',
                   '--batch_size', '2', '--feature_type', 'logmel',
                   '--audio_16k', '--stop_iteration', '2'])
    # two iterations, no eval checkpoint expected — just a clean exit and
    # a statistics dir
    assert os.path.isdir(os.path.join(str(ws), 'statistics'))
