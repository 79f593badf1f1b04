"""python -m unicycler_tpu — CLI entry point."""

from .pipeline.main import main

if __name__ == '__main__':
    main()
