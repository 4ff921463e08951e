"""``python -m bridge_analytics_template_spark`` — see :mod:`.cli`."""

from .cli import main

raise SystemExit(main())
