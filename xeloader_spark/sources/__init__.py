"""Sources: the narrow event-source abstraction (SURVEY §7.3) — decoded
parquet traces today, XML traces (`sys.fn_xe_file_target_read_file`
shape) as the public-format path; real binary `.xel` stays out of scope
(format lives in a closed SDK, SURVEY §2.1 S4)."""
