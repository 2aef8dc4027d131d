"""Sources/sinks (SURVEY.md §2.1): FITS scan (pure-python header/data
parser, no astropy required), CSV-driven path scans, config table loaders,
Parquet/VOTable/FITS-table sinks."""

from hiss_cube_spark.sources.fits import scan_fits_headers, parse_fits_header
from hiss_cube_spark.sources.csv_lists import image_paths_from_csv, spectra_paths_from_csv
from hiss_cube_spark.sources.config_tables import load_ccd_table, load_transmission_curves

__all__ = [
    "scan_fits_headers",
    "parse_fits_header",
    "image_paths_from_csv",
    "spectra_paths_from_csv",
    "load_ccd_table",
    "load_transmission_curves",
]
