"""(stub, filled in as the build proceeds)"""
