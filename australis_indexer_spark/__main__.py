"""``python -m australis_indexer_spark`` — see cli.py."""

from .cli import main

raise SystemExit(main())
