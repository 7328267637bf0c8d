"""Legacy-setuptools shim.

All metadata lives in pyproject.toml; this file exists so environments
with setuptools older than the PEP 660 editable-install support (no
``build_editable`` hook / no ``wheel``) can still do
``python setup.py develop`` or ``pip install --no-use-pep517 -e .``.
"""

from setuptools import find_packages, setup

setup(
    name="parquet-merger-spark",
    version="0.4.0",
    packages=find_packages(include=["parquet_merger_spark*"]),
    python_requires=">=3.10",
    install_requires=["pyspark>=3.5", "numpy>=1.24", "pandas>=2.0", "pyarrow>=12"],
    entry_points={
        "console_scripts": [
            "parquet-merger-spark = parquet_merger_spark.__main__:main",
        ]
    },
)
