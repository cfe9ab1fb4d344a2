"""CLI entry points mirroring the reference's surface:

- ``python -m smart_nar_fast_tts_tpu.cli.preprocess <preprocess.yaml>``
  (reference ``preprocess.py:7-14``)
- ``python -m smart_nar_fast_tts_tpu.cli.train -p ... -m ... -t ...
  [--restore_step N]`` (reference ``train.py:170-196``)
- ``python -m smart_nar_fast_tts_tpu.cli.synthesize --text "..."
  --restore_step N -p ... -m ... -t ... [--speaker_id K]``
  (reference ``synthesize.py:79-128``, including the ``--speaker_id`` flag
  the reference reads but forgot to register)
- ``python -m smart_nar_fast_tts_tpu.cli.evaluate`` — the reference's
  missing ``evaluate.py`` as a standalone tool
"""
