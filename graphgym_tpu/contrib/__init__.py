"""Contrib plugin packages (reference graphgym/contrib/: 15 sub-packages
auto-registered via `import *` at framework import).

Importing this package registers every contrib module's extensions into
graphgym_tpu.register; users drop new modules here (or anywhere that
calls the register_* functions before model build)."""

from graphgym_tpu.contrib import example  # noqa: F401
