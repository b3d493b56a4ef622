"""``python -m k_means_in_mapreduce_spark`` — see :mod:`.cli`."""

from .cli import main

if __name__ == "__main__":
    raise SystemExit(main())
