"""``python -m warmup_fir_filter_tpu`` runs the pipeline CLI."""

from warmup_fir_filter_tpu.cli import main

raise SystemExit(main())
