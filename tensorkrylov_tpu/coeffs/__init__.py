from .tables import BHTables, load_tables, select_bh, select_stenger, TMAX
