"""Production prediction CLI: audio files -> event XML
(``pytorch/predict.py:681-733``).

``predict``: every file in ``--input_dir`` is decoded (ffmpeg fallback
for non-wav), sliding-window inferred with framewise-averaged merging,
event-decoded, and written as ``<workspace>/predict_results/<name>.xml``.
``predict_asr`` additionally transcribes detected speech segments when a
speech-recognition backend is installed (optional dependency).
"""

from __future__ import annotations

import argparse
import os
import time

from sed_tpu.cli import common
from sed_tpu.config import PREDICT_SED_PARAMS, SPEECH_LABELS


def _build_engine(args, cfg, ws):
    from sed_tpu.serve.engine import SedInferenceEngine
    model, variables = common.build_model_and_variables(
        args, cfg, ws, checkpoint=args.checkpoint)
    sed_params = common.load_sed_params(args, cfg, ws, PREDICT_SED_PARAMS)
    return SedInferenceEngine(
        model, variables, cfg, sample_duration=args.sample_duration,
        overlap=args.overlap, overlap_value=args.overlap_value,
        sed_params=sed_params, batch_size=args.batch_size)


def predict(args):
    cfg, ws = common.resolve(args)
    engine = _build_engine(args, cfg, ws)
    out_dir = ws.predict_results_dir(create=True)

    audio_files = sorted(
        os.path.join(args.input_dir, f)
        for f in os.listdir(args.input_dir)
        if not f.startswith('.'))
    for path in audio_files:
        print('Predicting on {}'.format(path))
        t0 = time.time()
        events, xml = engine.predict_file(path)
        for event in events:
            print('onset: {}, offset: {}, event_label: {}\n'.format(
                event['onset'], event['offset'], event['event_label']))
        name = os.path.basename(path)
        stem = name[:-len('.wav')] if name.endswith('.wav') else \
            os.path.splitext(name)[0]
        out_path = os.path.join(out_dir, stem + '.xml')
        with open(out_path, 'w') as f:
            f.write(xml)
        print('Time taken to process {}: {} s\n'.format(
            path, time.time() - t0))
    return audio_files


def predict_asr(args):
    """predict + ASR transcription of speech segments
    (``pytorch/predict.py:410-677``).  Requires the optional
    ``speech_recognition`` package and ffmpeg; events in speech classes
    get a ``text=`` attribute in the XML."""
    try:
        import speech_recognition as sr  # optional dependency
    except ImportError as exc:
        raise SystemExit(
            'predict_asr requires the optional speech_recognition '
            'package: ' + str(exc))
    import subprocess
    import tempfile

    cfg, ws = common.resolve(args)
    engine = _build_engine(args, cfg, ws)
    out_dir = ws.predict_results_dir(create=True)
    recognizer = sr.Recognizer()

    audio_files = sorted(
        os.path.join(args.input_dir, f)
        for f in os.listdir(args.input_dir)
        if not f.startswith('.'))
    for path in audio_files:
        events, _ = engine.predict_file(path)
        for event in events:
            if event['event_label'] in SPEECH_LABELS:
                with tempfile.NamedTemporaryFile(suffix='.wav') as tmp:
                    subprocess.run(
                        ['ffmpeg', '-y', '-i', path,
                         '-ss', str(event['onset']),
                         '-to', str(event['offset']),
                         '-ar', '16000', tmp.name],
                        check=True, stdout=subprocess.DEVNULL,
                        stderr=subprocess.DEVNULL)
                    try:
                        with sr.AudioFile(tmp.name) as source:
                            audio_data = recognizer.record(source)
                        event['text'] = recognizer.recognize_google(
                            audio_data, language=args.asr_language)
                    except (sr.UnknownValueError, sr.RequestError):
                        pass
        from sed_tpu.post.xml_writer import events_to_xml
        name = os.path.basename(path)
        stem = os.path.splitext(name)[0]
        xml = events_to_xml(events, name)
        with open(os.path.join(out_dir, stem + '.xml'), 'w') as f:
            f.write(xml)
    return audio_files


def get_parser():
    parser = argparse.ArgumentParser(description='sed_tpu predict')
    subparsers = parser.add_subparsers(dest='mode', required=True)
    for mode in ('predict', 'predict_asr'):
        sub = subparsers.add_parser(mode)
        common.add_common_args(sub, require_dataset=False)
        sub.add_argument('--input_dir', type=str, required=True)
        sub.add_argument('--overlap', action='store_true', default=False)
        sub.add_argument('--sample_duration', type=int, default=5)
        sub.add_argument('--overlap_value', type=float, default=1.0)
        sub.add_argument('--checkpoint', type=str, default=None,
                         help='Orbax dir or reference .pth; defaults to '
                              'the workspace convention path.')
        if mode == 'predict_asr':
            sub.add_argument('--asr_language', type=str, default='en-SG')
    return parser


def main(argv=None):
    args = get_parser().parse_args(argv)
    if args.mode == 'predict':
        predict(args)
    else:
        predict_asr(args)


if __name__ == '__main__':
    main()
