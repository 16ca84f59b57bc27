from tpuvo.cli import main

main()
