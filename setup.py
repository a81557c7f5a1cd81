"""Build hooks: metadata lives in pyproject.toml; this file only adds the
OPTIONAL C++ host-ops extension (stan4bart_tpu._hostops, built from
native/hostops.cpp — the runtime counterpart of the reference package's
configure.ac/src native layer).  Every entry point has a pure-numpy
fallback (stan4bart_tpu/native.py), so a failed native build must never
fail the install: build errors degrade to the fallback with a notice."""

from setuptools import Extension, setup
from setuptools.command.build_ext import build_ext


class OptionalBuildExt(build_ext):
    """Try to build _hostops; on any toolchain failure, skip it."""

    def run(self):
        try:
            super().run()
        except Exception as e:  # pragma: no cover - toolchain-dependent
            print(f"stan4bart-tpu: skipping optional native extension "
                  f"({e}); pure-numpy fallbacks will be used")

    def build_extension(self, ext):
        try:
            super().build_extension(ext)
        except Exception as e:  # pragma: no cover - toolchain-dependent
            print(f"stan4bart-tpu: skipping optional native extension "
                  f"{ext.name} ({e}); pure-numpy fallbacks will be used")


setup(
    ext_modules=[
        Extension(
            "stan4bart_tpu._hostops",
            sources=["native/hostops.cpp"],
            extra_compile_args=["-O3", "-std=c++17"],
            optional=True,
        )
    ],
    cmdclass={"build_ext": OptionalBuildExt},
)
