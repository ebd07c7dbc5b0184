"""Composable loss system (MasterLoss, ELB, CRF)."""
