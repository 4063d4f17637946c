"""CLI entry (the analogue of satellite/src/Satellite.cpp:1-7)."""
from .cli import main

if __name__ == "__main__":
    raise SystemExit(main())
