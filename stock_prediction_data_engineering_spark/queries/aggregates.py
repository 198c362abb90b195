"""(populated in M1+)"""
