"""``python -m bd_delete_records_from_external_hive_table_spark`` entry point."""

import sys

from .cli import main

sys.exit(main())
