from symspark.sources.datagen import (  # noqa: F401
    gen_dsym_store,
    gen_dsym_symbols,
    gen_proguard_mapping,
    gen_proguard_store,
    gen_sourcemap_store,
    gen_sourcemap_tokens,
    gen_transcripts,
    write_all,
)
