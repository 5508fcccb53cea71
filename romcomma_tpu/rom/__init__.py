from romcomma_tpu.rom.rom import ROM, run_rom
