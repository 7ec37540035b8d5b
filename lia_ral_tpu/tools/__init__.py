"""CLI tools mirroring the reference binaries (SURVEY.md §2.2-2.4).

Each module exposes ``main(config)`` plus a ``python -m`` entry point that
parses the reference CLI convention (--config FILE, --key value overrides).
Artifacts between tools stay files with the reference formats, so the
file-DAG pipelines of the reference keep working.
"""
