from vmrframe_tpu.cli import main

main()
